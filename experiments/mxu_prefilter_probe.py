"""Round-3 de-risking probe: can a bf16 MXU matmul conservatively prefilter
Moller-Trumbore pairs? (PERF_NOTES.md round-3 roadmap item 1.)

Formulation: every M-T numerator is bilinear in ray features
F = [d, m=o x d, o, 1] (K=10) and per-triangle columns
    det: [-n      | 0   | 0 | 0    ]     n  = e1 x e2
    up : [-(e2xv0)| e2  | 0 | 0    ]
    vp : [-(v0xe1)| -e1 | 0 | 0    ]
    tp : [0       | 0   | n | -v0.n]
so all four terms for a (B rays, C tris) tile are ONE (B, K) @ (K, 4C)
matmul. In bf16 the MXU does it in one pass; the filter accepts a pair iff
the M-T conditions hold within error margins bounded by
  |term_bf16 - term_f32| <= gamma * (|F| @ |G|)        (computable by a
second matmul of the absolute values — also on the MXU).

This script measures, on the bench city's real clusters and engine-sorted
bounce-like rays:
  1. the actual bf16 term error vs the margin bound (is the bound sound?)
  2. the pair acceptance rate of the margined bf16 filter vs the true f32
     hit rate (how much exact VPU work survives)
  3. acceptance at sub-block(16) and block(128) gate granularity (what the
     sweep kernel could skip)

Run:  python experiments/mxu_prefilter_probe.py   (TPU or CPU)
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
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.engine.wavefront import _coherence_key


def main():
    hs = build_city_scene(n_boxes=12500)
    cs = compile_scene(
        hs, leaf_size=8, wide_width=8, build_wide_bvh=False, cluster_size=256
    ).clusters
    rows = np.asarray(cs.rows)  # (S, 16, SUPER*C)
    c = cs.cluster_size
    s_n, _, w = rows.shape
    # un-interleave supers back to flat clusters: member k of super s
    flat = rows.reshape(s_n, 16, 8, c).transpose(0, 2, 1, 3).reshape(-1, 16, c)
    v0 = flat[:, 0:3].transpose(0, 2, 1)  # (M, C, 3)
    e1 = flat[:, 3:6].transpose(0, 2, 1)
    e2 = flat[:, 6:9].transpose(0, 2, 1)

    # per-tri G columns (f64 build, like the real thing would)
    n = np.cross(e1.astype(np.float64), e2.astype(np.float64))
    c2 = np.cross(e2.astype(np.float64), v0.astype(np.float64))
    c1 = np.cross(v0.astype(np.float64), e1.astype(np.float64))
    s0 = np.einsum("mck,mck->mc", v0.astype(np.float64), n)

    # K=10 feature order: [d(3), m(3), o(3), 1]
    def g_for(term):
        M, C = n.shape[0], n.shape[1]
        G = np.zeros((M, 10, C), np.float64)
        if term == "det":
            G[:, 0:3] = -n.transpose(0, 2, 1)
        elif term == "up":
            G[:, 0:3] = -c2.transpose(0, 2, 1)
            G[:, 3:6] = e2.transpose(0, 2, 1)
        elif term == "vp":
            G[:, 0:3] = -c1.transpose(0, 2, 1)
            G[:, 3:6] = -e1.transpose(0, 2, 1)
        else:  # tp
            G[:, 6:9] = n.transpose(0, 2, 1)
            G[:, 9] = -s0
        return G

    G = np.concatenate([g_for(t) for t in ("det", "up", "vp", "tp")], axis=2)
    # (M, 10, 4C)

    # engine-sorted bounce-like rays
    rng = np.random.default_rng(0)
    nr = 4096
    ob = rng.uniform(-50, 50, (nr, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, nr)
    db = rng.normal(0, 1, (nr, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    key = _coherence_key(
        Vec3(*(jnp.asarray(ob[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(db[:, i]) for i in range(3))),
        jnp.zeros((nr,), bool), cs.scene_aabb,
    )
    order = np.asarray(jnp.argsort(key))
    ob, db = ob[order], db[order]
    m = np.cross(ob.astype(np.float64), db.astype(np.float64))
    F = np.concatenate(
        [db.astype(np.float64), m, ob.astype(np.float64), np.ones((nr, 1))], axis=1
    )  # (N, 10)

    # pick a random subset of clusters each 128-ray block would visit
    M = G.shape[0]
    cl_ids = rng.integers(0, M, 32)

    gamma = 8 * 2.0 ** -8  # bf16 mantissa 8 bits, K=10 terms, slack x8
    results = {}
    acc_counts = {"pairs": 0, "accepted": 0, "true_hits": 0,
                  "sub16_gates": 0, "sub16_open": 0,
                  "blk128_gates": 0, "blk128_open": 0, "unsound": 0}
    for b in range(nr // 128):
        Fb = F[b * 128 : (b + 1) * 128]
        for ci in cl_ids:
            Gc = G[ci]  # (10, 4C)
            exact = (Fb @ Gc).astype(np.float64)  # (128, 4C) reference
            bf = np.asarray(
                jnp.dot(
                    jnp.asarray(Fb, jnp.bfloat16),
                    jnp.asarray(Gc, jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            ).astype(np.float64)
            bound = np.abs(Fb) @ np.abs(Gc) * gamma  # margin per pair/term
            err = np.abs(bf - exact)
            acc_counts["unsound"] += int((err > bound).sum())

            det = exact[:, 0:c]; up = exact[:, c:2*c]
            vp = exact[:, 2*c:3*c]; tp = exact[:, 3*c:4*c]
            sgn = np.where(det >= 0, 1.0, -1.0)
            true_hit = ((det * sgn > 0) & (up * sgn >= 0) & (vp * sgn >= 0)
                        & ((up + vp) * sgn <= det * sgn) & (tp * sgn > 0))

            detb = bf[:, 0:c]; upb = bf[:, c:2*c]
            vpb = bf[:, 2*c:3*c]; tpb = bf[:, 3*c:4*c]
            mdet = bound[:, 0:c]; mup = bound[:, c:2*c]
            mvp = bound[:, 2*c:3*c]; mtp = bound[:, 3*c:4*c]
            sgnb = np.where(detb >= 0, 1.0, -1.0)
            # conservative: accept if conditions COULD hold within margins
            accept = ((np.abs(detb) + mdet > 0)
                      & (upb * sgnb >= -(mup + mdet))
                      & (vpb * sgnb >= -(mvp + mdet))
                      & ((upb + vpb) * sgnb <= np.abs(detb) + mup + mvp + mdet)
                      & (tpb * sgnb > -(mtp + mdet)))
            missed = true_hit & ~accept
            if missed.any():
                acc_counts["unsound"] += int(missed.sum())
            acc_counts["pairs"] += accept.size
            acc_counts["accepted"] += int(accept.sum())
            acc_counts["true_hits"] += int(true_hit.sum())
            sub = accept.reshape(8, 16, c).any(axis=1)  # (8 sub-blocks, C tris)
            acc_counts["sub16_gates"] += sub.size
            acc_counts["sub16_open"] += int(sub.sum())
            acc_counts["blk128_gates"] += c
            acc_counts["blk128_open"] += int(accept.any(axis=0).sum())

    results = {
        "pair_accept_rate": round(acc_counts["accepted"] / acc_counts["pairs"], 4),
        "true_hit_rate": round(acc_counts["true_hits"] / acc_counts["pairs"], 5),
        "sub16_open_rate": round(acc_counts["sub16_open"] / acc_counts["sub16_gates"], 4),
        "blk128_open_rate": round(acc_counts["blk128_open"] / acc_counts["blk128_gates"], 4),
        "unsound_pairs": acc_counts["unsound"],
        "note": "open rates = fraction of (gate granularity, tri) tiles the "
                "exact VPU pass would still evaluate; unsound must be 0",
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
