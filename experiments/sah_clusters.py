"""SAH-aware treelet splits vs the shipped median split (PERF_NOTES round-3
idea 4): at each recursion of the treelet builder, pick the (axis, aligned
split) pair minimizing the surface-area-heuristic cost
SA(left)*n_left + SA(right)*n_right over centroid bounds, instead of always
splitting the longest axis at the snapped median.

Reports per-block cull selectivity (supers visited / member-cluster evals)
for camera-tile, random, and engine-sorted ray sets, plus cluster-radius
quantiles, for both orders.

Run:  python experiments/sah_clusters.py   (TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_city_scene
import optixpathtracer_tpu.builder as builder
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from cull_stats import _stats


def sah_treelet_order(centroids: np.ndarray, cluster_size: int, group: int = 8):
    """Treelet order with SAH-scored (axis, split) choice among
    cluster-aligned candidates. Same output contract as
    bvh.clusters.treelet_order."""
    n = len(centroids)
    ctr = np.asarray(centroids, np.float64)
    out = np.empty(n, np.int64)
    pos = 0
    big = int(cluster_size) * int(group)
    c = int(cluster_size)
    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        k = len(ids)
        if k <= c:
            out[pos:pos + k] = ids
            pos += k
            continue
        sub = ctr[ids]
        align = big if k > big else c
        splits = np.arange(align, ((k - 1) // align) * align + 1, align)
        best = (np.inf, 0, None)
        for ax in range(3):
            srt = np.argsort(sub[:, ax], kind="stable")
            pts = sub[srt]
            pmin = np.minimum.accumulate(pts, axis=0)
            pmax = np.maximum.accumulate(pts, axis=0)
            smin = np.minimum.accumulate(pts[::-1], axis=0)[::-1]
            smax = np.maximum.accumulate(pts[::-1], axis=0)[::-1]

            def sa(d):
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            cost = sa(pmax[splits - 1] - pmin[splits - 1]) * splits + sa(
                smax[splits] - smin[splits]
            ) * (k - splits)
            j = int(np.argmin(cost))
            if cost[j] < best[0]:
                best = (float(cost[j]), int(splits[j]), srt)
        _, split, srt = best
        stack.append(ids[srt[split:]])
        stack.append(ids[srt[:split]])
    return out


def radius_stats(cl):
    r = np.asarray(cl.spheres[:, 3])
    r = r[r > 0]
    return {
        "median_cluster_r": round(float(np.median(r)), 2),
        "p90_cluster_r": round(float(np.quantile(r, 0.9)), 2),
    }


def run(order_fn, label, hs, rays):
    t0 = time.perf_counter()
    old = builder.treelet_order
    builder.treelet_order = order_fn
    try:
        cs = builder.compile_scene(
            hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
            cluster_size=256,
        ).clusters
    finally:
        builder.treelet_order = old
    build_s = time.perf_counter() - t0
    ocam, dcam, ob, db = rays

    sort_j = jax.jit(lambda ov, dv: jnp.argsort(_coherence_key(
        Vec3(ov[:, 0], ov[:, 1], ov[:, 2]), Vec3(dv[:, 0], dv[:, 1], dv[:, 2]),
        jnp.zeros((ov.shape[0],), bool), cs.scene_aabb)))
    sorder = np.asarray(sort_j(jnp.asarray(ob), jnp.asarray(db)))

    res = {"build_s": round(build_s, 2), **radius_stats(cs)}
    for name, (o, d) in {
        "camera_tiles": (ocam, dcam),
        "random": (ob, db),
        "random_sorted": (ob[sorder], db[sorder]),
    }.items():
        sup, ev = _stats(cs, o, d)
        res[name] = {"supers": round(sup, 1), "evals": round(ev, 1)}
    print(label, json.dumps(res))
    return res


def main():
    hs = build_city_scene(n_boxes=12500)
    rng = np.random.default_rng(0)

    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=1200 / 800)
    uu, vv, ww = cam.uvw_frame()
    w_t, h_t = 256, 128
    xs, ys = np.meshgrid(np.arange(w_t), np.arange(h_t))
    tx, ty = xs // 16, ys // 8
    order = np.lexsort([xs.ravel() % 16 + 16 * (ys.ravel() % 8),
                        tx.ravel() + ty.ravel() * 64])
    px = (xs.ravel()[order] + 0.5) / w_t * 2 - 1
    py = (ys.ravel()[order] + 0.5) / h_t * 2 - 1
    dcam = px[:, None] * uu[None] + py[:, None] * vv[None] + ww[None]
    dcam = (dcam / np.linalg.norm(dcam, axis=1, keepdims=True)).astype(np.float32)
    ocam = np.broadcast_to(np.asarray(cam.eye, np.float32), dcam.shape).copy()

    nr = 32768
    ob = rng.uniform(-50, 50, (nr, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, nr)
    db = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    rays = (ocam, dcam, ob, db)

    from optixpathtracer_tpu.bvh.clusters import treelet_order

    run(treelet_order, "median", hs, rays)
    run(sah_treelet_order, "sah   ", hs, rays)


if __name__ == "__main__":
    main()
