"""First on-chip measurement of the hierarchical (node) cluster backend
(round 5): exactness + sweep rates at 150k (city) and 1.35M (big) triangles,
hier vs flat where the flat path still compiles.

Run (TPU):  PYTHONPATH=.:$PYTHONPATH python experiments/hier_probe.py [--big-only]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from optixpathtracer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import bench as B
from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from optixpathtracer_tpu.ops.traverse_cluster import (
    closest_hit_cluster,
    closest_hit_cluster_exec_stats,
    any_hit_cluster,
    reference_closest,
)


def make_rays(cs, cam, n=131072, seed=7):
    rng = np.random.default_rng(seed)
    uu, vv, ww = cam.uvw_frame()
    w_t, h_t = 512, 256
    xs, ys = np.meshgrid(np.arange(w_t), np.arange(h_t))
    order = np.lexsort([
        xs.ravel() % 16 + 16 * (ys.ravel() % 8),
        xs.ravel() // 16 + (ys.ravel() // 8) * (w_t // 16),
    ])
    px = (xs.ravel()[order] + 0.5) / w_t * 2 - 1
    py = (ys.ravel()[order] + 0.5) / h_t * 2 - 1
    dcam = px[:n, None] * uu[None] + py[:n, None] * vv[None] + ww[None]
    dcam = (dcam / np.linalg.norm(dcam, axis=1, keepdims=True)).astype(np.float32)
    ocam = np.broadcast_to(np.asarray(cam.eye, np.float32), dcam.shape).copy()

    bb = np.asarray(cs.clusters.scene_aabb)
    lo, hi = bb[0:3], bb[3:6]
    ob = (lo + rng.uniform(0.05, 0.95, (n, 3)) * (hi - lo)).astype(np.float32)
    db = rng.normal(0, 1, (n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    key = jax.jit(lambda ov, dv: _coherence_key(
        Vec3(ov[:, 0], ov[:, 1], ov[:, 2]), Vec3(dv[:, 0], dv[:, 1], dv[:, 2]),
        jnp.zeros((ov.shape[0],), bool), cs.clusters.scene_aabb))
    sorder = np.argsort(np.asarray(key(jnp.asarray(ob), jnp.asarray(db))),
                        kind="stable")
    return ocam, dcam, ob[sorder], db[sorder]


def v3(a):
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


def sweep_rate(fn, o, d, reps=2):
    ov, dv = v3(o), v3(d)
    jax.block_until_ready(fn(ov, dv))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(ov, dv)
    jax.block_until_ready(r)
    return len(o) * reps / (time.perf_counter() - t0) / 1e6


def probe_scene(tag, cs, cam, flat_too, gate_n=8192):
    cl = cs.clusters
    print(f"== {tag}: {cs.num_triangles} tris, {cl.num_entries} entries, "
          f"{-(-cl.num_entries // 8)} nodes")
    ocam, dcam, ob, db = make_rays(cs, cam)

    # exactness gate on a mixed subset
    og = np.concatenate([ocam[:gate_n // 2], ob[:gate_n // 2]])
    dg = np.concatenate([dcam[:gate_n // 2], db[:gate_n // 2]])
    ref = reference_closest(cl, v3(og), v3(dg), 1e-3, 1e16)
    got = closest_hit_cluster(cl, v3(og), v3(dg), 1e-3, 1e16, hier=True)
    mm = int((np.asarray(ref.tri) != np.asarray(got.tri)).sum())
    print(f"  exactness: {mm} mismatches of {gate_n} "
          f"({(np.asarray(ref.tri) >= 0).sum()} hits)")

    for name, o, d in (("camera", ocam, dcam), ("bounce_sorted", ob, db)):
        fh = jax.jit(lambda ov, dv: closest_hit_cluster(
            cl, ov, dv, 1e-3, 1e16, hier=True).t)
        rate_h = sweep_rate(fh, o, d)
        _t, pairs = jax.jit(lambda ov, dv: closest_hit_cluster_exec_stats(
            cl, ov, dv, 1e-3, 1e16, hier=True))(v3(o), v3(d))
        line = (f"  {name}: hier {rate_h:.3f} Mrays/s/sweep, "
                f"exec {float(pairs) / 1e9:.2f} Gpairs")
        if flat_too:
            ff = jax.jit(lambda ov, dv: closest_hit_cluster(
                cl, ov, dv, 1e-3, 1e16, hier=False).t)
            rate_f = sweep_rate(ff, o, d)
            _t2, pairs_f = jax.jit(
                lambda ov, dv: closest_hit_cluster_exec_stats(
                    cl, ov, dv, 1e-3, 1e16, hier=False))(v3(o), v3(d))
            line += (f" | flat {rate_f:.3f} Mrays/s/sweep, "
                     f"exec {float(pairs_f) / 1e9:.2f} Gpairs")
        print(line, flush=True)

    fa = jax.jit(lambda ov, dv: any_hit_cluster(
        cl, ov, dv, 1e-2, 1e16, hier=True)[0])
    print(f"  any-hit bounce: hier {sweep_rate(fa, ob, db):.3f} Mrays/s/sweep",
          flush=True)


def main():
    big_only = "--big-only" in sys.argv
    t0 = time.perf_counter()
    if not big_only:
        hs = B.build_city_scene(n_boxes=12500)
        cs = compile_scene(hs, leaf_size=8, wide_width=8,
                           build_wide_bvh=False, cluster_size=256)
        cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0),
                     up=(0, 1, 0), fov_y=45, aspect_ratio=1.5)
        probe_scene("city-150k", cs, cam, flat_too=True)

    hs = B.build_big_scene()
    t0 = time.perf_counter()
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    print(f"big build: {time.perf_counter() - t0:.1f}s")
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=1.5)
    probe_scene("big-1.35M", cs, cam, flat_too=True)


if __name__ == "__main__":
    main()
