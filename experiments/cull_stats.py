"""Cull selectivity stats: supers visited and member-cluster evals per
128-ray block on the bench city, for camera-tile / random / engine-sorted
ray sets. Used to compare cull formulations (sphere vs slab, PERF_NOTES.md).

Run:  python experiments/cull_stats.py   (TPU or CPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_city_scene
from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from optixpathtracer_tpu.ops.traverse_cluster import block_cull


def _stats(cs, o, d, block=128):
    # one jitted program end-to-end: through the axon tunnel, EAGER jnp ops
    # dispatch remotely at ~10-30 ms each, which turns block_cull's ~50-op
    # prologue into minutes (the round-1 LBVH lesson all over again)
    @functools.partial(jax.jit, static_argnames=("blk",))
    def run(ov, dv, blk):
        cull = block_cull(cs, Vec3(ov[:, 0], ov[:, 1], ov[:, 2]),
                          Vec3(dv[:, 0], dv[:, 1], dv[:, 2]),
                          1e-3, 1e16, blk)
        return cull.count, cull.bits_lo, cull.bits_hi

    cnt_d, lo_d, hi_d = run(jnp.asarray(o), jnp.asarray(d), block)
    cnt = np.asarray(cnt_d)[:, 0]
    lo = np.asarray(lo_d)
    hi = np.asarray(hi_d)
    # member k of any sub-block open => the groups=1 kernel evaluates it:
    # per-member union across sub-blocks = OR of the byte lanes of lo and hi
    u = (lo | (lo >> 8) | (lo >> 16) | (lo >> 24) |
         hi | (hi >> 8) | (hi >> 16) | (hi >> 24)) & 0xFF
    evals = np.zeros(lo.shape[0], np.int64)
    for k in range(8):
        evals += ((u >> k) & 1).astype(np.int64).sum(axis=1)
    return float(cnt.mean()), float(evals.mean())


def main():
    hs = build_city_scene(n_boxes=12500)
    cs = compile_scene(
        hs, leaf_size=8, wide_width=8, build_wide_bvh=False, cluster_size=256
    ).clusters
    rng = np.random.default_rng(0)

    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=1200 / 800)
    uu, vv, ww = cam.uvw_frame()
    # camera rays in 16x8 pixel tiles (the engine's dispatch layout)
    w_t, h_t = 256, 128
    xs, ys = np.meshgrid(np.arange(w_t), np.arange(h_t))
    tx, ty = xs // 16, ys // 8
    order = np.lexsort([xs.ravel() % 16 + 16 * (ys.ravel() % 8), tx.ravel() + ty.ravel() * 64])
    px = (xs.ravel()[order] + 0.5) / w_t * 2 - 1
    py = (ys.ravel()[order] + 0.5) / h_t * 2 - 1
    dcam = px[:, None] * uu[None] + py[:, None] * vv[None] + ww[None]
    dcam /= np.linalg.norm(dcam, axis=1, keepdims=True)
    ocam = np.broadcast_to(np.asarray(cam.eye, np.float32), dcam.shape).copy()

    nr = 32768
    ob = rng.uniform(-50, 50, (nr, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, nr)
    db = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    sort_j = jax.jit(lambda ov, dv: jnp.argsort(_coherence_key(
        Vec3(ov[:, 0], ov[:, 1], ov[:, 2]), Vec3(dv[:, 0], dv[:, 1], dv[:, 2]),
        jnp.zeros((ov.shape[0],), bool), cs.scene_aabb)))
    sorder = np.asarray(sort_j(jnp.asarray(ob), jnp.asarray(db)))

    out = {}
    out["camera_tiles"] = _stats(cs, ocam.astype(np.float32), dcam.astype(np.float32))
    out["random"] = _stats(cs, ob, db)
    out["random_sorted"] = _stats(cs, ob[sorder], db[sorder])
    print(json.dumps({k: {"supers_per_block": round(v[0], 1),
                          "member_evals_per_block": round(v[1], 1)}
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
