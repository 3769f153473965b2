"""Primitive intersection routines, batched SoA (the device-side analog of
optixTrace's fixed-function triangle tests + cuda/sphere.cu's custom primitive).

All functions broadcast over leading shapes; rays and primitives are Vec3 SoA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import Vec3, cross, dot

Array = jax.Array

BIG_T = 1e30


def ray_triangle(
    o: Vec3,
    d: Vec3,
    v0: Vec3,
    v1: Vec3,
    v2: Vec3,
    t_min: Array,
    t_max: Array,
) -> tuple[Array, Array, Array, Array]:
    """Möller–Trumbore. Returns (hit, t, u, v); misses get t = BIG_T.

    Mirrors the hardware triangle test the reference leans on via optixTrace
    (deviceProgram.cu:165-204); barycentrics match optixGetTriangleBarycentrics.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = cross(d, e2)
    det = dot(e1, p)
    # two-sided test (the reference does not cull backfaces)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tv = o - v0
    u = dot(tv, p) * inv_det
    q = cross(tv, e1)
    v = dot(d, q) * inv_det
    t = dot(e2, q) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, jnp.where(hit, t, BIG_T), u, v


def ray_aabb(
    o: Vec3,
    inv_d: Vec3,
    bmin: Vec3,
    bmax: Vec3,
    t_min: Array,
    t_max: Array,
) -> Array:
    """Slab test; robust to inf from axis-parallel rays."""
    t0x = (bmin.x - o.x) * inv_d.x
    t1x = (bmax.x - o.x) * inv_d.x
    t0y = (bmin.y - o.y) * inv_d.y
    t1y = (bmax.y - o.y) * inv_d.y
    t0z = (bmin.z - o.z) * inv_d.z
    t1z = (bmax.z - o.z) * inv_d.z
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), t_min),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), t_max),
    )
    return near <= far


class SphereHit(NamedTuple):
    hit: Array
    t: Array
    nx: Array
    ny: Array
    nz: Array


def ray_sphere(
    o: Vec3,
    d: Vec3,
    center: Vec3,
    radius: Array,
    t_min: Array,
    t_max: Array,
) -> SphereHit:
    """Analytic sphere with root refinement (cuda/sphere.cu:37-96 semantics).

    Returns the nearest root inside (t_min, t_max) and the outward unit normal.
    """
    oc = o - center
    inv_len = jax.lax.rsqrt(jnp.maximum(dot(d, d), 1e-30))
    dn = d * inv_len
    b = dot(oc, dn)
    c = dot(oc, oc) - radius * radius
    disc = b * b - c
    has = disc > 0.0
    sdisc = jnp.sqrt(jnp.maximum(disc, 0.0))
    root1 = -b - sdisc
    root2 = -b + sdisc
    t1 = root1 * inv_len
    t2 = root2 * inv_len
    ok1 = has & (t1 > t_min) & (t1 < t_max)
    ok2 = has & (t2 > t_min) & (t2 < t_max)
    t = jnp.where(ok1, t1, jnp.where(ok2, t2, BIG_T))
    root = jnp.where(ok1, root1, root2)
    hit = ok1 | ok2
    n = (oc + dn * root) / jnp.maximum(radius, 1e-20)
    return SphereHit(hit, t, n.x, n.y, n.z)
