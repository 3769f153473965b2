"""Per-ray candidate stats: sizes the upside of a cluster-major (pair-packed)
sweep vs the current block-union sweep (PERF_NOTES.md rebinning analysis).

For engine-sorted bounce rays on the bench city it reports, per 128-ray block:
  - block_member_evals: candidates the groups=1 kernel would evaluate (the
    cull_stats number),
  - walk_member_evals:  what the CURRENT kernel actually evaluates once the
    near-to-far walk + per-group early exit (groups=2, stride 4) fires —
    simulated exactly from the cull outputs + true hit distances,
  - perray_members / perray_supers: mean per-RAY candidate clusters/supers
    (the single-pass rebinned cost, /128 rays per packed block),
  - perray_members_exit: per-ray candidates whose slab ENTRY precedes the
    ray's true hit (perfect per-ray early exit — the rebinned lower bound).

Run:  python experiments/perray_stats.py   (TPU; jit end-to-end, see
cull_stats.py's eager-dispatch warning)
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
from optixpathtracer_tpu.bvh.clusters import SUPER
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key
from optixpathtracer_tpu.ops.traverse_cluster import closest_hit_cluster


@functools.partial(jax.jit, static_argnames=("cs_id",))
def _perray(ov, dv, spheres, aabb, cs_id=0):
    """Per-(ray, cluster) slab hits + entry distances, all (N, M)."""
    o = Vec3(ov[:, 0], ov[:, 1], ov[:, 2])
    d = Vec3(dv[:, 0], dv[:, 1], dv[:, 2])
    n = ov.shape[0]
    # scene-AABB reach cap (same as block_cull)
    ix = 1.0 / jnp.where(jnp.abs(d.x) > 1e-30, d.x, 1e-30)
    iy = 1.0 / jnp.where(jnp.abs(d.y) > 1e-30, d.y, 1e-30)
    iz = 1.0 / jnp.where(jnp.abs(d.z) > 1e-30, d.z, 1e-30)
    t0x, t1x = (aabb[0] - o.x) * ix, (aabb[3] - o.x) * ix
    t0y, t1y = (aabb[1] - o.y) * iy, (aabb[4] - o.y) * iy
    t0z, t1z = (aabb[2] - o.z) * iz, (aabb[5] - o.z) * iz
    entry = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    exit_ = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    reach = jnp.where(exit_ >= entry, jnp.maximum(exit_, 0.0), 0.0)
    tM = (reach * (1.0 + 1e-5) + 1e-6)[:, None]  # (N, 1)
    tm = jnp.full((n, 1), 1e-3, jnp.float32)

    q = spheres[None, :, 0:3]  # (1, M, 3)
    h = spheres[None, :, 4:7]
    o3 = ov[:, None, 0:3]
    d3 = dv[:, None, 0:3]
    iv = 1.0 / jnp.where(jnp.abs(d3) > 1e-30, d3, 1e-30)
    mid = (q - o3) * iv
    rad = h * jnp.abs(iv)
    tn = jnp.max(jnp.concatenate([mid - rad, jnp.zeros_like(mid[..., :1])], -1), -1)
    tf = jnp.min(jnp.concatenate([mid + rad, jnp.broadcast_to(tM[..., None], mid[..., :1].shape)], -1), -1)
    hit = (tM > tm) & (tn <= tf + jnp.abs(tf) * 4e-7 + 1e-30)  # (N, M)
    return hit, tn, tM[:, 0]


def main():
    hs = build_city_scene(n_boxes=12500)
    cc = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    cs = cc.clusters
    rng = np.random.default_rng(0)
    nr = 32768
    ob = rng.uniform(-50, 50, (nr, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, nr)
    db = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    sort_j = jax.jit(lambda o, d: jnp.argsort(_coherence_key(
        Vec3(o[:, 0], o[:, 1], o[:, 2]), Vec3(d[:, 0], d[:, 1], d[:, 2]),
        jnp.zeros((o.shape[0],), bool), cs.scene_aabb)))
    order = np.asarray(sort_j(jnp.asarray(ob), jnp.asarray(db)))
    ob, db = ob[order], db[order]

    hit_d, tn_d, _ = _perray(jnp.asarray(ob), jnp.asarray(db),
                             cs.spheres, cs.scene_aabb)
    rec = closest_hit_cluster(cs, Vec3(*[jnp.asarray(ob[:, i]) for i in range(3)]),
                              Vec3(*[jnp.asarray(db[:, i]) for i in range(3)]))
    hit = np.asarray(hit_d)          # (N, M) cluster-major (sid*SUPER+k)
    tn = np.asarray(tn_d)
    thit = np.asarray(rec.t)         # BIG_T for misses

    m = hit.shape[1]
    s = m // SUPER
    out = {}
    out["perray_members"] = float(hit.sum(1).mean())
    hit_s = hit.reshape(nr, s, SUPER).any(2)
    out["perray_supers"] = float(hit_s.sum(1).mean())
    # perfect per-ray early exit: candidate opens before the true hit
    texit = np.minimum(thit, 3e37) * (1 + 1e-5) + 1e-6
    useful = hit & (tn <= texit[:, None])
    out["perray_members_exit"] = float(useful.sum(1).mean())
    out["perray_supers_exit"] = float(
        useful.reshape(nr, s, SUPER).any(2).sum(1).mean())

    # block-level (current kernel), exact walk simulation
    b = 128
    nb = nr // b
    hb = hit.reshape(nb, b, s, SUPER)
    tb = tn.reshape(nb, b, s, SUPER)
    out["block_member_evals"] = float(hb.any(1).sum((1, 2)).mean())

    # near-to-far walk with groups=2 + stride-4 gmax refresh (the shipped
    # kernel): per block, supers sorted by block-level key = min over members
    # of min over rays of max(tn, 0) clamped... the real key is the
    # box-to-box separation; ray-min entry is a faithful stand-in (both are
    # lower bounds; entry is tighter), so this slightly UNDERCOUNTS walk
    # length vs the shipped key. Good enough to size the gap.
    walk_evals = 0
    groups_evals = 0
    thitb = texit.reshape(nb, b)
    for blk in range(nb):
        open_m = hb[blk].any(0)                    # (s, SUPER)
        keys = np.where(hb[blk], np.maximum(tb[blk], 0.0), np.inf).min(0).min(1)  # (s,)
        order_s = np.argsort(keys)
        g0 = slice(0, b // 2)
        g1 = slice(b // 2, b)
        best = thitb[blk].copy()
        gmax = np.array([best[g0].max(), best[g1].max()])
        for step, sid in enumerate(order_s):
            if not np.isfinite(keys[sid]):
                break
            if keys[sid] > gmax.max():
                break
            for g, sl in enumerate((g0, g1)):
                if keys[sid] > gmax[g]:
                    continue
                for k in range(SUPER):
                    if hb[blk, sl, sid, k].any():
                        groups_evals += 1
            for k in range(SUPER):
                if open_m[sid, k]:
                    walk_evals += 1
            if step % 4 == 3:
                gmax = np.array([best[g0].max(), best[g1].max()])
    out["walk_member_evals"] = walk_evals / nb           # groups=1 equivalent
    out["walk_group_evals_g2"] = groups_evals / nb       # (64,256) evals
    out["walk_fullblock_equiv"] = groups_evals / 2 / nb  # in (128,256) units
    print(json.dumps({k: round(v, 1) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
