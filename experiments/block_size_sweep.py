"""Sweep-kernel timing vs ray-block size and ordering on real TPU.

The block-union coherence tax (perray_stats.py: per-ray 9.8 candidate
clusters vs ~99 evaluated per 128-ray block) can be attacked without the
pair-packing glue by (a) smaller ray blocks — a (B, C) M-T eval's compute is
~proportional to B, and a 32-ray union is much tighter than a 128-ray one —
and (b) candidate-aware ordering (sort rays by their nearest candidate super
first, then the spatial key). This measures both on 524288 engine-sorted
bounce rays, bench city.

Run:  python experiments/block_size_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_city_scene
from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from optixpathtracer_tpu.ops.traverse_cluster import (
    any_hit_cluster, block_cull, closest_hit_cluster)


def timeit(fn, iters=3):
    _ = float(fn())
    t0 = time.perf_counter()
    for _i in range(iters):
        _ = float(fn())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    hs = build_city_scene(n_boxes=12500)
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256).clusters
    rng = np.random.default_rng(0)
    n = 524288
    ob = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, n)
    db = rng.normal(0, 1, (n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    sort_j = jax.jit(lambda o, d: jnp.argsort(_coherence_key(
        Vec3(o[:, 0], o[:, 1], o[:, 2]), Vec3(d[:, 0], d[:, 1], d[:, 2]),
        jnp.zeros((o.shape[0],), bool), cs.scene_aabb)))
    order = np.asarray(sort_j(jnp.asarray(ob), jnp.asarray(db)))
    ob, db = ob[order], db[order]
    ov = Vec3(*(jnp.asarray(ob[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(db[:, i]) for i in range(3)))

    @functools.partial(jax.jit, static_argnames=("block", "groups", "anyh"))
    def run(o, d, block, groups, anyh):
        if anyh:
            occ, _ = any_hit_cluster(cs, o, d, 0.01, 30.0, block=block,
                                     groups=groups)
            return jnp.sum(occ.astype(jnp.float32))
        rec = closest_hit_cluster(cs, o, d, block=block, groups=groups)
        return jnp.sum(jnp.minimum(rec.t, 1.0))

    res = {}
    for block, groups in [(128, 2), (128, 1), (64, 2), (64, 1), (32, 1),
                          (256, 2), (256, 4)]:
        res[f"closest_b{block}_g{groups}"] = round(timeit(
            lambda b=block, g=groups: run(ov, dv, b, g, False)), 1)
    for block, groups in [(128, 2), (64, 2), (64, 1), (32, 1)]:
        res[f"any_b{block}_g{groups}"] = round(timeit(
            lambda b=block, g=groups: run(ov, dv, b, g, True)), 1)

    # candidate-aware re-ordering: nearest-candidate super id as leading key
    cull = block_cull(cs, ov, dv, 1e-3, 1e16, 128)
    near = np.asarray(cull.ids[:, 0])  # per-BLOCK nearest super (proxy)
    # per-ray nearest super: recompute per-ray keys cheaply in numpy
    sph = np.asarray(cs.spheres)
    q, h = sph[None, :, 0:3], sph[None, :, 4:7]
    best = np.full(n, -1, np.int64)
    csz = 65536
    for i0 in range(0, n, csz):
        sl = slice(i0, i0 + csz)
        o3, d3 = ob[sl, None, :], db[sl, None, :]
        iv = 1.0 / np.where(np.abs(d3) > 1e-30, d3, 1e-30)
        mid = (q - o3) * iv
        rad = h * np.abs(iv)
        tn = np.maximum((mid - rad).max(2), 0.0)
        tf = (mid + rad).min(2)
        ok = tn <= tf + np.abs(tf) * 4e-7 + 1e-30
        tn = np.where(ok, tn, np.inf)
        best[sl] = tn.argmin(1)
    key2 = best * n + np.arange(n)  # stable within existing order
    order2 = np.argsort(key2, kind="stable")
    ov2 = Vec3(*(jnp.asarray(ob[order2][:, i]) for i in range(3)))
    dv2 = Vec3(*(jnp.asarray(db[order2][:, i]) for i in range(3)))
    for block, groups in [(128, 2), (64, 1)]:
        res[f"closest_nearsort_b{block}_g{groups}"] = round(timeit(
            lambda b=block, g=groups: run(ov2, dv2, b, g, False)), 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
