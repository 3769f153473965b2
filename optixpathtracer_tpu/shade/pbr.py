"""Metallic-roughness GGX direct lighting (the whitted-pipeline shading).

Reference: cuda/whitted.cu __closesthit__radiance (:114-198) — base color x
texture, F0=0.04 dielectric split, Cook-Torrance with Schlick Fresnel +
Smith-style visibility + GGX NDF (whitted_cuda.h schlick/vis/ggxNormal
:48-80), one shadow ray per point light, ambient adds base color.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import INV_PI, Vec3, dot, lerp, where

Array = jax.Array

F0 = 0.04


def schlick(spec_color: Vec3, v_dot_h: Array) -> Vec3:
    m = jnp.clip(1.0 - v_dot_h, 0.0, 1.0)
    m2 = m * m
    return spec_color + (1.0 - spec_color) * (m2 * m2 * m)


def vis(n_dot_l: Array, n_dot_v: Array, alpha: Array) -> Array:
    """Height-correlated-ish visibility term (whitted_cuda.h vis)."""
    a2 = alpha * alpha
    gv = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v * n_dot_v * (1.0 - a2) + a2, 1e-12))
    gl = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l * n_dot_l * (1.0 - a2) + a2, 1e-12))
    return 0.5 / jnp.maximum(gv + gl, 1e-12)


def ggx_normal(n_dot_h: Array, alpha: Array) -> Array:
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-12)


def direct_light(
    base_color: Vec3,
    metallic: Array,
    roughness: Array,
    n: Vec3,
    v: Vec3,  # unit, toward viewer
    l: Vec3,  # unit, toward light
    light_color: Vec3,  # color * intensity
    visible: Array,  # shadow-ray result (True == unoccluded)
) -> Vec3:
    """One point light's contribution at a hit (whitted.cu:158-188)."""
    diff_color = base_color * ((1.0 - F0) * (1.0 - metallic))
    one = Vec3.ones(jnp.shape(metallic))
    spec_color = lerp(one * F0, base_color, metallic)
    alpha = roughness * roughness

    h = Vec3(l.x + v.x, l.y + v.y, l.z + v.z)
    hn = jax.lax.rsqrt(jnp.maximum(dot(h, h), 1e-12))
    h = h * hn
    n_dot_l = dot(n, l)
    n_dot_v = dot(n, v)
    n_dot_h = dot(n, h)
    v_dot_h = dot(v, h)

    f = schlick(spec_color, v_dot_h)
    g = vis(n_dot_l, n_dot_v, alpha)
    d = ggx_normal(n_dot_h, alpha)

    diff = (one - f) * diff_color * INV_PI
    spec = f * (g * d)
    lit = (n_dot_l > 0.0) & (n_dot_v > 0.0) & visible
    out = light_color * ((diff + spec) * n_dot_l)
    return where(lit, out, Vec3.zeros(jnp.shape(metallic)))
