"""Granularity curve for the sweep's eval volume — sizes BOTH round-3 routes
to fewer Moller-Trumbore evals (VERDICT item 2):

A. *Pair binning at ray-group granularity g*: evaluating (g, C) blocks only
   for groups whose slab test passes. The per-block eval volume in
   (128, C)-equivalent units equals the mean candidate count per g-group
   (``static_g``), because a block has 128/g groups each costing g/128 of a
   full eval. static_1 is the per-ray floor (9.8 on bounce rays, round 2);
   static_128 is the block union the shipped kernel walks (~98.8).

B. *Two-pass recull*: a capped pass-1 walk (first VISITS supers near-to-far)
   yields a conservative per-ray upper bound on the hit t; pass 2 re-culls
   with t_max = that bound, shrinking every group's candidate set toward the
   perfect-exit numbers (``cap2_g``/``exit_g``) with NO new kernel machinery.

Outputs one JSON dict per ray set (camera tiles at the bench frame shape;
engine-sorted incoherent bounce rays) with, for each g in {1..128}:
  static_g   slab candidates per g-group (= binned eval volume, (128,C) units)
  exit_g     same under the PERFECT per-ray bound t <= t_hit (oracle floor)
  cap2_g     same under the pass-1 bound from walking the first 2 supers

Run on the TPU (reductions are on-device; only scalars cross the tunnel):
    python experiments/granularity_stats.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_city_scene
from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.bvh.clusters import SUPER
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from optixpathtracer_tpu.ops.traverse_cluster import closest_hit_cluster
from experiments.perray_stats import _perray

GRANS = (1, 2, 4, 8, 16, 32, 64, 128)
BLOCK = 128


def camera_rays(cs, width=1200, height=800, stride=8):
    """Bench camera rays in the renderer's 16x8 tile order, one tile block
    in every `stride` (the full (N, M) matrix would be ~0.5 GB)."""
    cam = Camera(
        eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
        fov_y=45, aspect_ratio=width / height,
    )
    u, v, w = cam.uvw_frame()
    n = width * height
    ys, xs = np.divmod(np.arange(n, dtype=np.int64), width)
    tw, th = 16, 8
    tiles_x = -(-width // tw)
    tile_id = (ys // th) * tiles_x + (xs // tw)
    within = (ys % th) * tw + (xs % tw)
    perm = np.argsort(tile_id * (tw * th) + within, kind="stable")
    perm = perm.reshape(-1, BLOCK)[::stride].reshape(-1)
    xs, ys = xs[perm], ys[perm]
    dx = (2.0 * (xs + 0.5) / width - 1.0)[:, None]
    dy = (2.0 * (ys + 0.5) / height - 1.0)[:, None]
    dvec = u[None, :] * dx + v[None, :] * dy + w[None, :]
    dvec /= np.linalg.norm(dvec, axis=1, keepdims=True)
    ov = np.broadcast_to(np.asarray(cam.eye, np.float32), dvec.shape).copy()
    return ov.astype(np.float32), dvec.astype(np.float32)


def bounce_rays(cs, nr=32768, seed=0):
    rng = np.random.default_rng(seed)
    ob = rng.uniform(-50, 50, (nr, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, nr)
    db = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    key = _coherence_key(
        Vec3(*(jnp.asarray(ob[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(db[:, i]) for i in range(3))),
        jnp.zeros((nr,), bool), cs.scene_aabb,
    )
    order = np.argsort(np.asarray(key), kind="stable")
    return ob[order], db[order]


def stats(cs, ov, dv, slot_of_tri):
    """All (N, M)-sized work stays ON DEVICE (the tunnel moves ~50 MB/min;
    only the ~two dozen scalar results are fetched)."""
    n = (ov.shape[0] // BLOCK) * BLOCK
    ov, dv = ov[:n], dv[:n]
    hit, tn, _ = _perray(jnp.asarray(ov), jnp.asarray(dv),
                         cs.spheres, cs.scene_aabb)
    rec = closest_hit_cluster(
        cs, Vec3(*(jnp.asarray(ov[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(dv[:, i]) for i in range(3))),
    )
    m = hit.shape[1]
    c = cs.cluster_size
    sup = jnp.asarray(slot_of_tri)

    @jax.jit
    def reduce_all(hit, tn, thit, tri):
        hit_cluster = jnp.where(tri >= 0, sup[jnp.maximum(tri, 0)] // c, -1)
        texit = (jnp.minimum(thit, 3e37) * (1 + 1e-5) + 1e-6)[:, None]
        useful = hit & (tn <= texit)

        # pass-1 bound: walk the 2 nearest surviving supers of each block
        # (block-level min-entry key); a ray whose true hit cluster is a
        # member of those supers gets bound t_hit, the rest keep t_max
        nb = n // BLOCK
        hb = hit.reshape(nb, BLOCK, m)
        tb = tn.reshape(nb, BLOCK, m)
        skey = jnp.where(hb, jnp.maximum(tb, 0.0), jnp.inf).min(1)
        skey = skey.reshape(nb, m // SUPER, SUPER).min(2)  # (nb, S)
        first2 = jnp.argsort(skey, axis=1)[:, :2]  # (nb, 2)
        hc_b = hit_cluster.reshape(nb, BLOCK)
        in_first2 = (hc_b // SUPER == first2[:, 0:1]) | (
            hc_b // SUPER == first2[:, 1:2]
        )
        bound = jnp.where(
            (hc_b >= 0) & in_first2, texit.reshape(nb, BLOCK), 3e37
        )
        cap2 = hit & (tn <= bound.reshape(n, 1))

        out = {}
        for g in GRANS:
            ng = n // g
            for name, mat in (("static", hit), ("exit", useful),
                              ("cap2", cap2)):
                cand = mat.reshape(ng, g, m).any(1).sum(1)
                out[f"{name}_{g}"] = cand.astype(jnp.float32).mean()
        return out

    out = reduce_all(hit, tn, rec.t, rec.tri)
    return {k: float(v) for k, v in out.items()}


def main():
    hs = build_city_scene(n_boxes=12500)
    cc = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    cs = cc.clusters
    tm = np.asarray(cs.tri_map) if cs.tri_map is not None else None
    if tm is None:
        slot_of_tri = np.arange(cs.num_slots, dtype=np.int64)
    else:
        slot_of_tri = np.zeros(max(cs.num_slots, int(tm.max()) + 1), np.int64)
        slot_of_tri[tm] = np.arange(len(tm), dtype=np.int64)

    ov, dv = camera_rays(cs)
    print("camera", json.dumps(
        {k: round(v, 2) for k, v in stats(cs, ov, dv, slot_of_tri).items()}))
    ov, dv = bounce_rays(cs)
    print("bounce", json.dumps(
        {k: round(v, 2) for k, v in stats(cs, ov, dv, slot_of_tri).items()}))


if __name__ == "__main__":
    main()
