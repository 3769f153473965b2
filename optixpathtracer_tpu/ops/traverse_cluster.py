"""Cluster traversal — exact, gather-free replacement for optixTrace.

This is the TPU-native answer to the reference's hardware traversal
(HelloPathtracing_original/deviceProgram.cu:165-204 traceRadiance /
traceOcclusion). Instead of a BVH walk (pointer chasing the TPU cannot do
fast — measured ~26 GB/s ceiling on XLA gathers, see PERF_NOTES.md), rays
are processed in coherent fixed-size blocks against fixed-size triangle
clusters (bvh/clusters.py):

  1. CULL (XLA): one dense (rays x clusters) ray-vs-bounding-sphere test,
     OR-reduced over each ray block — the EXACT union of per-ray candidate
     sets, not a lossy block-cone bound. Per block the surviving cluster ids
     are ordered near-to-far by a provable distance lower bound.
  2. SWEEP (Pallas): one grid step per ray block. The kernel walks the
     surviving clusters near-to-far; each iteration DMAs that cluster's
     (9, C) triangle rows HBM->VMEM (double-buffered — no XLA gather) and
     evaluates exact float32 Moller-Trumbore for all B x C ray/triangle
     pairs as (B, C)-shaped VPU ops, keeping the per-ray closest hit.
     The walk EARLY-EXITS as soon as every live ray's best hit is closer
     than the next cluster's distance lower bound.

Exactness: the cull is conservative (a cluster is skipped only if provably
unreachable by every ray in the block), the per-triangle test is exact f32,
and the per-block cluster list physically cannot overflow (it is capped at
M = all clusters). There is no truncation failure mode — unlike traverse_bfs.

Coherence: selectivity of the block cull is what makes this fast; callers
should order rays coherently (pixel tiles for camera rays; sorted wavefronts
for bounce rays). Incoherent blocks stay CORRECT — they just visit more
clusters.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bvh.clusters import NUM_ROWS, ClusterSet
from ..core.math import Vec3
from .intersect import BIG_T
from .traverse import HitRecord

Array = jax.Array
_I32 = jnp.int32
_F32 = jnp.float32

DEFAULT_BLOCK = 128
_BIG = 3.0e37  # python float: safe to close over in kernels


class CullResult(NamedTuple):
    ids: Array  # (NR, M) int32 cluster ids, survivors first, near-to-far
    keys: Array  # (NR, M) f32 sorted distance lower bounds (BIG for misses)
    count: Array  # (NR, 1) int32 number of surviving clusters
    rays8: Array  # (NR*B, 8) f32 [o(3), d(3), t_min, t_max]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad1(a: Array, n8: int, fill: float) -> Array:
    n = a.shape[0]
    return jnp.concatenate([a, jnp.full((n8 - n,), fill, a.dtype)]) if n8 > n else a


def block_cull(
    cs: ClusterSet,
    o: Vec3,
    d: Vec3,
    t_min: Array,
    t_max: Array,
    block: int,
) -> CullResult:
    """Stage 1: per-ray sphere tests, OR-reduced per ray block.

    Per ray (unit direction u, geometric reach R = t_max*|d|) vs cluster
    sphere (q, r): candidate iff the infinite line passes within r of q
    (perp^2 <= r^2) AND the closest approach lies in [-r, R + r]. The block
    mask is the union over the block's live rays — exact, not a cone bound.

    Near-to-far key per (block, cluster): |q - Ob| - (r + Rb) where (Ob, Rb)
    bounds the block's live origins — a provable lower bound on any hit's
    geometric distance, used for the kernel's early exit.
    """
    n = o.x.shape[0]
    nb = _round_up(max(n, block), block)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, _F32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, _F32), (n,))
    # padding rays are dead (t_max <= t_min)
    ox, oy, oz = (_pad1(a, nb, 0.0) for a in (o.x, o.y, o.z))
    dx, dy, dz = (_pad1(a, nb, 1.0) for a in (d.x, d.y, d.z))
    tm = _pad1(t_min, nb, 1.0)
    tM = _pad1(t_max, nb, 0.0)
    rays8 = jnp.stack([ox, oy, oz, dx, dy, dz, tm, tM], axis=1)

    alive = tM > tm
    dlen = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv = 1.0 / jnp.maximum(dlen, 1e-30)
    ux, uy, uz = dx * inv, dy * inv, dz * inv
    reach = tM * dlen  # geometric t_max

    sph = cs.spheres  # (M, 8)
    qx, qy, qz, qr = sph[:, 0], sph[:, 1], sph[:, 2], sph[:, 3]

    # ---- per-ray candidate test, fused into a per-block any-reduce ----
    wx = qx[None, :] - ox[:, None]  # (N, M)
    wy = qy[None, :] - oy[:, None]
    wz = qz[None, :] - oz[:, None]
    tc = wx * ux[:, None] + wy * uy[:, None] + wz * uz[:, None]
    d2 = wx * wx + wy * wy + wz * wz
    perp2 = d2 - tc * tc
    r = qr[None, :]
    hit_ray = (
        alive[:, None]
        & (perp2 <= r * r)
        & (tc >= -r)
        & (tc - r <= reach[:, None])
    )
    nr = nb // block
    m = sph.shape[0]
    mask = jnp.any(hit_ray.reshape(nr, block, m), axis=1)  # (NR, M)

    # ---- block-level near-to-far lower bound ----
    alive_b = alive.reshape(nr, block)
    any_alive = jnp.any(alive_b, axis=1, keepdims=True)

    def ob(a):
        ab = a.reshape(nr, block)
        lo = jnp.min(jnp.where(alive_b, ab, _BIG), axis=1, keepdims=True)
        hi = jnp.max(jnp.where(alive_b, ab, -_BIG), axis=1, keepdims=True)
        lo = jnp.where(any_alive, lo, 0.0)
        hi = jnp.where(any_alive, hi, 0.0)
        return 0.5 * (lo + hi), hi - lo

    obx, ex = ob(ox)
    oby, ey = ob(oy)
    obz, ez = ob(oz)
    rb = 0.5 * jnp.sqrt(ex * ex + ey * ey + ez * ez)  # (NR, 1)
    bx = qx[None, :] - obx
    by = qy[None, :] - oby
    bz = qz[None, :] - obz
    dist_b = jnp.sqrt(bx * bx + by * by + bz * bz)  # (NR, M)
    key = jnp.maximum(dist_b - (qr[None, :] + rb), 0.0)
    key = jnp.where(mask, key, _BIG)

    ids0 = jnp.broadcast_to(jnp.arange(m, dtype=_I32)[None, :], (nr, m))
    keys, ids = jax.lax.sort([key, ids0], num_keys=1)
    count = jnp.sum(mask.astype(_I32), axis=1, keepdims=True)
    return CullResult(ids=ids, keys=keys, count=count, rays8=rays8)


def _mt_block(o3, d3, rows):
    """Moller-Trumbore numerators for a (B rays) x (C tris) block.

    o3/d3: (B, 3) slices; rows: (9, C) = [v0 | e1 | e2]. Returns
    (det, u*det, v*det, t*det), each (B, C), computed entirely as
    broadcasted f32 VPU ops. Derivation: Cramer on [e1 e2 -d] x = o - v0;
    the reference's per-thread version is deviceProgram.cu's intersection
    via optixTrace hardware; here it's explicit (cited for spec parity).
    """
    ox, oy, oz = o3[:, 0:1], o3[:, 1:2], o3[:, 2:3]
    dx, dy, dz = d3[:, 0:1], d3[:, 1:2], d3[:, 2:3]
    v0x, v0y, v0z = rows[0:1, :], rows[1:2, :], rows[2:3, :]
    e1x, e1y, e1z = rows[3:4, :], rows[4:5, :], rows[5:6, :]
    e2x, e2y, e2z = rows[6:7, :], rows[7:8, :], rows[8:9, :]
    # p = d x e2                                    (B, C)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    # T = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    up = tx * px + ty * py + tz * pz
    # q = T x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vp = dx * qx + dy * qy + dz * qz
    tp = e2x * qx + e2y * qy + e2z * qz
    return det, up, vp, tp


def _mt_epilogue(det, up, vp, tp, tm, best, bu, bv, btri, cid, c):
    """Resolve per-ray closest hit from (B, C) M-T numerators.

    Comparisons are in t-form (one divide by det) to avoid overflow of
    products with the BIG miss sentinel. det's sign is folded via s."""
    s = jnp.where(det >= 0.0, 1.0, -1.0).astype(_F32)
    ad = det * s
    us = up * s
    vs = vp * s
    ts = tp * s
    pos = ad > 0.0
    invd = jnp.where(pos, 1.0 / jnp.where(pos, ad, 1.0), 0.0)
    t = ts * invd
    cond = pos & (us >= 0.0) & (vs >= 0.0) & (us + vs <= ad) & (t > tm) & (t < best)
    tcand = jnp.where(cond, t, jnp.float32(BIG_T))
    tbest = jnp.min(tcand, axis=1, keepdims=True)
    better = tbest < best
    iota = jax.lax.broadcasted_iota(_I32, tcand.shape, 1)
    jbest = jnp.min(
        jnp.where(tcand == tbest, iota, jnp.int32(c)), axis=1, keepdims=True
    )
    one = iota == jbest
    selu = jnp.sum(jnp.where(one, us * invd, 0.0), axis=1, keepdims=True)
    selv = jnp.sum(jnp.where(one, vs * invd, 0.0), axis=1, keepdims=True)
    best = jnp.where(better, tbest, best)
    bu = jnp.where(better, selu, bu)
    bv = jnp.where(better, selv, bv)
    btri = jnp.where(better, cid * c + jbest, btri)
    return best, bu, bv, btri


def _closest_kernel(
    ids_ref, keys_ref, cnt_ref, rays_ref, rows_hbm,
    t_ref, u_ref, v_ref, tri_ref, rbuf, sem, *, c: int, m: int,
):
    # ids/keys/cnt arrive in 8-row SMEM tiles (Mosaic block-shape rule);
    # this grid step's row within the tile:
    r = jax.lax.rem(pl.program_id(0), 8)
    count = cnt_ref[r, 0]
    o3 = rays_ref[:, 0:3]
    d3 = rays_ref[:, 3:6]
    tm = rays_ref[:, 6:7]
    tM = rays_ref[:, 7:8]
    b = o3.shape[0]
    dlen = jnp.sqrt(
        d3[:, 0:1] ** 2 + d3[:, 1:2] ** 2 + d3[:, 2:3] ** 2
    )  # (B, 1) t -> geometric units for the early-exit bound

    def dma(slot, j):
        return pltpu.make_async_copy(
            rows_hbm.at[ids_ref[r, j]], rbuf.at[slot], sem.at[slot]
        )

    @pl.when(count > 0)
    def _():
        dma(0, 0).start()

    best0 = tM
    gmax0 = jnp.max(jnp.minimum(best0 * dlen, _BIG))
    init = (
        jnp.int32(0),
        gmax0,
        best0,
        jnp.zeros((b, 1), _F32),
        jnp.zeros((b, 1), _F32),
        jnp.full((b, 1), -1, _I32),
    )

    def cond(carry):
        i, gmax = carry[0], carry[1]
        # early exit: every ray's best hit is closer than the next cluster's
        # provable distance lower bound (keys are sorted ascending)
        return (i < count) & (keys_ref[r, jnp.minimum(i, m - 1)] <= gmax)

    def body(carry):
        i, gmax, best, bu, bv, btri = carry
        cur = jnp.bitwise_and(i, 1)

        @pl.when(i + 1 < count)
        def _():
            dma(1 - cur, i + 1).start()

        dma(cur, i).wait()
        cid = ids_ref[r, i]
        det, up, vp, tp = _mt_block(o3, d3, rbuf[cur])
        best, bu, bv, btri = _mt_epilogue(
            det, up, vp, tp, tm, best, bu, bv, btri, cid, c
        )
        gmax = jnp.max(jnp.minimum(best * dlen, _BIG))
        return i + 1, gmax, best, bu, bv, btri

    i_f, _, best, bu, bv, btri = jax.lax.while_loop(cond, body, init)

    # early exit leaves the (i_f)-th DMA started but unconsumed; drain it so
    # the semaphore is balanced for the next grid step
    @pl.when(i_f < count)
    def _():
        dma(jnp.bitwise_and(i_f, 1), i_f).wait()

    t_ref[:, :] = best
    u_ref[:, :] = bu
    v_ref[:, :] = bv
    tri_ref[:, :] = btri


@functools.partial(jax.jit, static_argnames=("block", "interpret", "cluster_size"))
def _closest_pallas(
    rows, ids, keys, count, rays8, *, block: int, interpret: bool,
    cluster_size: int,
):
    m = rows.shape[0]
    c = cluster_size
    nr = rays8.shape[0] // block
    kernel = functools.partial(_closest_kernel, c=c, m=m)
    outs = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((8, m), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, m), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rays8.shape[0], 1), _F32),
            jax.ShapeDtypeStruct((rays8.shape[0], 1), _F32),
            jax.ShapeDtypeStruct((rays8.shape[0], 1), _F32),
            jax.ShapeDtypeStruct((rays8.shape[0], 1), _I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ROWS, c), _F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ids, keys, count, rays8, rows)
    return outs


def closest_hit_cluster(
    cs: ClusterSet,
    o: Vec3,
    d: Vec3,
    t_min: Array | float = 0.001,
    t_max: Array | float = 1e16,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> HitRecord:
    """Exact closest-hit for a ray wavefront (cluster backend)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = o.x.shape[0]
    cull = block_cull(cs, o, d, t_min, t_max, block)
    t, u, v, tri = _closest_pallas(
        cs.rows, cull.ids, cull.keys, cull.count, cull.rays8,
        block=block, interpret=bool(interpret), cluster_size=cs.cluster_size,
    )
    t = t[:n, 0]
    tri = tri[:n, 0]
    miss = tri < 0
    return HitRecord(
        t=jnp.where(miss, jnp.float32(BIG_T), t),
        tri=jnp.where(miss, -1, tri),
        u=jnp.where(miss, 0.0, u[:n, 0]),
        v=jnp.where(miss, 0.0, v[:n, 0]),
    )


def any_hit_cluster(
    cs: ClusterSet,
    o: Vec3,
    d: Vec3,
    t_min: Array | float = 0.01,
    t_max: Array | float = 1e16,
    block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> tuple[Array, Array]:
    """Occlusion query: (occluded (N,), overflow scalar == 0 always).

    Reuses the closest-hit sweep (correct; terminate-on-first-hit is a later
    optimization). Matches any_hit_bfs's interface."""
    rec = closest_hit_cluster(cs, o, d, t_min, t_max, block, interpret)
    return rec.tri >= 0, jnp.zeros((), _F32)


def reference_closest(
    cs: ClusterSet,
    o: Vec3,
    d: Vec3,
    t_min: Array | float = 0.001,
    t_max: Array | float = 1e16,
) -> HitRecord:
    """Dense no-cull oracle: same M-T math, scanned over every cluster.

    Used by tests as an independent check (the cull must never change
    results) and usable as an exact no-BVH fallback on any backend."""
    n = o.x.shape[0]
    c = cs.cluster_size
    tm = jnp.broadcast_to(jnp.asarray(t_min, _F32), (n,))[:, None]
    tM = jnp.broadcast_to(jnp.asarray(t_max, _F32), (n,))[:, None]
    o3 = jnp.stack([o.x, o.y, o.z], axis=1)
    d3 = jnp.stack([d.x, d.y, d.z], axis=1)

    init = (
        tM,
        jnp.zeros((n, 1), _F32),
        jnp.zeros((n, 1), _F32),
        jnp.full((n, 1), -1, _I32),
    )

    def step(carry, xs):
        rows, cid = xs
        best, bu, bv, btri = carry
        det, up, vp, tp = _mt_block(o3, d3, rows)
        return _mt_epilogue(det, up, vp, tp, tm, best, bu, bv, btri, cid, c), None

    m = cs.rows.shape[0]
    (best, bu, bv, btri), _ = jax.lax.scan(
        step, init, (cs.rows, jnp.arange(m, dtype=_I32))
    )
    tri = btri[:, 0]
    miss = tri < 0
    return HitRecord(
        t=jnp.where(miss, jnp.float32(BIG_T), best[:, 0]),
        tri=jnp.where(miss, -1, tri),
        u=jnp.where(miss, 0.0, bu[:, 0]),
        v=jnp.where(miss, 0.0, bv[:, 0]),
    )
