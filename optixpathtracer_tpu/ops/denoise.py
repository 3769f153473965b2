"""AOV-guided denoiser: edge-avoiding À-Trous wavelet filtering.

Replaces the reference's OptixDenoiser wrapper, whose init()/exec() are empty
stubs (HelloPathtracing_original/OptixDenoiser.cpp:15-43) while the renderer
still allocates and fills the color/albedo/normal guide buffers
(SimplePathtracer.cpp:124-136, deviceProgram.cu:472-474). Here the same three
guides drive a real filter (Dammertz et al. 2010 edge-avoiding À-Trous):
per-iteration 5x5 B3-spline taps with exponentially growing dilation, tap
weights modulated by color/normal/albedo similarity.

TPU-native: taps are static shifts (pad + slice) over the (H, W) planes —
pure dense VPU work that XLA fuses; no gather/scatter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# 5-tap B3-spline, separable (python floats: static weights under jit)
_B3 = (1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16)


def _shift2d(x: Array, dy: int, dx: int) -> Array:
    """Shift with edge clamp (replicate padding), static offsets."""
    h, w = x.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = [(py0, py1), (px0, px1)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad, mode="edge")
    return xp[py1 : py1 + h, px1 : px1 + w]


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    color: Array,  # (H, W, 3) linear radiance
    normal: Array,  # (H, W, 3)
    albedo: Array,  # (H, W, 3)
    iterations: int = 4,
    sigma_color: float = 0.5,
    sigma_normal: float = 0.25,
    sigma_albedo: float = 0.25,
) -> Array:
    """Edge-avoiding À-Trous filter; returns denoised (H, W, 3)."""
    out = color
    for it in range(iterations):
        step = 1 << it
        accum = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for i in range(5):
            for j in range(5):
                dy = (i - 2) * step
                dx = (j - 2) * step
                k = float(_B3[i] * _B3[j])
                c = _shift2d(out, dy, dx)
                nn = _shift2d(normal, dy, dx)
                aa = _shift2d(albedo, dy, dx)
                dc = jnp.sum((c - out) ** 2, -1, keepdims=True)
                dn = jnp.sum((nn - normal) ** 2, -1, keepdims=True)
                da = jnp.sum((aa - albedo) ** 2, -1, keepdims=True)
                wgt = k * jnp.exp(
                    -dc / (sigma_color * sigma_color)
                    - dn / (sigma_normal * sigma_normal)
                    - da / (sigma_albedo * sigma_albedo)
                )
                accum = accum + c * wgt
                wsum = wsum + wgt
        out = accum / jnp.maximum(wsum, 1e-8)
    return out


def bilateral_denoise(color: Array, sigma_space: int = 2, sigma_color: float = 0.4) -> Array:
    """Single-pass joint bilateral (no guides) — cheap fallback."""
    r = sigma_space
    accum = jnp.zeros_like(color)
    wsum = jnp.zeros(color.shape[:2] + (1,), color.dtype)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            c = _shift2d(color, dy, dx)
            spatial = jnp.exp(-(dy * dy + dx * dx) / (2.0 * r * r))
            dc = jnp.sum((c - color) ** 2, -1, keepdims=True)
            wgt = spatial * jnp.exp(-dc / (sigma_color * sigma_color))
            accum = accum + c * wgt
            wsum = wsum + wgt
    return accum / jnp.maximum(wsum, 1e-8)
