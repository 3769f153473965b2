"""Post-process: exposure, tone mapping, sRGB encode, RGBA8 pack.

Reference: toneMap.cu computeFinalPixelColorsKernel (:41-58, clamp(sqrt(x))
gamma-2 + RGBA8), the sv4 device-side reinhardToneMap
(HelloPathtracing_sv4_vmv23/deviceProgram.cu:124-129, Rec.709-luminance
Reinhard) with exposure 2^2 (:554-561), and cuda/helpers.h make_color /
toSRGB (:35-67, exact IEC sRGB curve + 8-bit quantize).

These fuse into the frame-finalize jit — no separate kernel launch needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import Vec3

Array = jax.Array

TONEMAP_NONE = "none"
TONEMAP_SQRT = "sqrt"  # toneMap.cu behavior (gamma 2.0)
TONEMAP_REINHARD = "reinhard"  # sv4 device behavior


def exposure(c: Vec3, stops: float) -> Vec3:
    """Exposure correction: c * 2^stops (sv4 uses stops=2)."""
    return c * (2.0**stops)


def reinhard(c: Vec3, white: float = 1.0) -> Vec3:
    lum = 0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z
    s = 1.0 / (1.0 + lum / white)
    return c * s


def to_srgb(c: Vec3) -> Vec3:
    """Exact sRGB OETF on clamped linear input (helpers.h toSRGB)."""

    def enc(x):
        x = jnp.clip(x, 0.0, 1.0)
        lo = 12.92 * x
        hi = 1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055
        return jnp.where(x < 0.0031308, lo, hi)

    return Vec3(enc(c.x), enc(c.y), enc(c.z))


def quantize_u8(x: Array) -> Array:
    """quantizeUnsigned8Bits: round-to-nearest with the 256*x - x/256 trick."""
    x = jnp.clip(x, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(jnp.uint8)


def finalize(
    c: Vec3,
    mode: str = TONEMAP_REINHARD,
    exposure_stops: float = 0.0,
    srgb: bool = True,
) -> Vec3:
    """Full post chain in linear float; returns display-ready [0,1] RGB."""
    if exposure_stops != 0.0:
        c = exposure(c, exposure_stops)
    if mode == TONEMAP_SQRT:
        c = Vec3(
            jnp.sqrt(jnp.maximum(c.x, 0.0)),
            jnp.sqrt(jnp.maximum(c.y, 0.0)),
            jnp.sqrt(jnp.maximum(c.z, 0.0)),
        )
    elif mode == TONEMAP_REINHARD:
        c = reinhard(c)
    elif mode != TONEMAP_NONE:
        raise ValueError(f"unknown tonemap mode {mode!r}")
    if srgb:
        c = to_srgb(c)
    else:
        c = Vec3(jnp.clip(c.x, 0, 1), jnp.clip(c.y, 0, 1), jnp.clip(c.z, 0, 1))
    return c


def pack_rgba8(c: Vec3) -> Array:
    """(...,) Vec3 in [0,1] -> (...,4) uint8 with alpha 255."""
    r = quantize_u8(c.x)
    g = quantize_u8(c.y)
    b = quantize_u8(c.z)
    a = jnp.full_like(r, 255)
    return jnp.stack([r, g, b, a], axis=-1)
