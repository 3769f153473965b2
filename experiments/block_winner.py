"""Clean re-measure of the block-size winners (no CPU contention):
closest sweep at b128/g2 (shipped) vs b64/g1 for sorted-bounce AND camera
tiles, any-hit b128/g2 vs b64/g1. See block_size_sweep.py for the full grid.
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
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from optixpathtracer_tpu.ops.traverse_cluster import (
    any_hit_cluster, closest_hit_cluster)


def timeit(fn, iters=4):
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

    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=1200 / 800)
    uu, vv, ww = cam.uvw_frame()
    w_t, h_t = 1024, 512
    xs, ys = np.meshgrid(np.arange(w_t), np.arange(h_t))
    tx, ty = xs // 16, ys // 8
    co = np.lexsort([xs.ravel() % 16 + 16 * (ys.ravel() % 8),
                     tx.ravel() + ty.ravel() * (w_t // 16)])
    px = (xs.ravel()[co] + 0.5) / w_t * 2 - 1
    py = (ys.ravel()[co] + 0.5) / h_t * 2 - 1
    dc = px[:, None] * uu[None] + py[:, None] * vv[None] + ww[None]
    dc = (dc / np.linalg.norm(dc, axis=1, keepdims=True)).astype(np.float32)
    oc = np.broadcast_to(np.asarray(cam.eye, np.float32), dc.shape)
    ocv = Vec3(*(jnp.asarray(oc[:, i].copy()) for i in range(3)))
    dcv = Vec3(*(jnp.asarray(dc[:, i]) for i in range(3)))

    @functools.partial(jax.jit, static_argnames=("block", "groups", "anyh"))
    def run(o, d, block, groups, anyh):
        if anyh:
            occ, _ = any_hit_cluster(cs, o, d, 0.01, 30.0, block=block,
                                     groups=groups)
            return jnp.sum(occ.astype(jnp.float32))
        rec = closest_hit_cluster(cs, o, d, block=block, groups=groups)
        return jnp.sum(jnp.minimum(rec.t, 1.0))

    res = {}
    for tag, b, g in [("b128_g2", 128, 2), ("b64_g1", 64, 1), ("b64_g2", 64, 2)]:
        res[f"bounce_closest_{tag}"] = round(timeit(
            lambda b=b, g=g: run(ov, dv, b, g, False)), 1)
    for tag, b, g in [("b128_g2", 128, 2), ("b64_g1", 64, 1)]:
        res[f"camera_closest_{tag}"] = round(timeit(
            lambda b=b, g=g: run(ocv, dcv, b, g, False)), 1)
        res[f"bounce_any_{tag}"] = round(timeit(
            lambda b=b, g=g: run(ov, dv, b, g, True)), 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
