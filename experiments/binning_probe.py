"""Bounce-sweep bin purity probe (VERDICT r3 item 3).

Hypothesis: the global octant-major sort leaves 128-ray blocks "sorted but
mixed at boundaries" — a block spanning a (octant, origin-cell) boundary
unions two candidate sets. Explicit binning pads each bin to a 128
multiple so every block is PURE, at the cost of padded lanes + scatter glue.

Measures, on engine-sorted interior bounce rays at sweep scale:
  * member evals/block + timed closest sweep for the baseline (global sort);
  * the same for binned+padded ray sets at several bin granularities,
    with the padding factor and the extra glue time accounted;
  * effective Mrays/s on the ORIGINAL ray count for each variant.

Run on TPU: PYTHONPATH=. python experiments/binning_probe.py
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench as B
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.math import Vec3
    from optixpathtracer_tpu.engine.wavefront import _coherence_key
    from optixpathtracer_tpu.ops.traverse_cluster import (
        block_cull,
        closest_hit_cluster,
    )

    hs = B.build_city_scene(n_boxes=12500)
    cl = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256).clusters

    n = 524288
    rng = np.random.default_rng(11)
    ob = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    ob[:, 1] = rng.uniform(0.2, 8, n).astype(np.float32)
    db = rng.normal(0, 1, (n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)

    key_j = jax.jit(lambda ov, dv: _coherence_key(
        Vec3(ov[:, 0], ov[:, 1], ov[:, 2]), Vec3(dv[:, 0], dv[:, 1], dv[:, 2]),
        jnp.zeros((ov.shape[0],), bool), cl.scene_aabb))
    keys = np.asarray(key_j(jnp.asarray(ob), jnp.asarray(db)))
    order = np.argsort(keys, kind="stable")
    ob, db, keys = ob[order], db[order], keys[order]

    def stats_and_time(o, d, tmax, label, n_effective):
        ov = jnp.asarray(o)
        dv = jnp.asarray(d)
        tm = jnp.asarray(tmax)

        @jax.jit
        def cull_bits(ov, dv, tm):
            cull = block_cull(cl, Vec3(ov[:, 0], ov[:, 1], ov[:, 2]),
                              Vec3(dv[:, 0], dv[:, 1], dv[:, 2]), 1e-3, tm, 128)
            return cull.bits_lo, cull.bits_hi

        @jax.jit
        def sweep(ov, dv, tm):
            rec = closest_hit_cluster(cl, Vec3(ov[:, 0], ov[:, 1], ov[:, 2]),
                                      Vec3(dv[:, 0], dv[:, 1], dv[:, 2]),
                                      1e-3, tm)
            return rec.t

        lo, hi = (np.asarray(a) for a in cull_bits(ov, dv, tm))
        u = (lo | (lo >> 8) | (lo >> 16) | (lo >> 24)
             | hi | (hi >> 8) | (hi >> 16) | (hi >> 24)) & 0xFF
        evals = sum(((u >> k) & 1).astype(np.int64).sum(axis=1)
                    for k in range(8))
        float(jnp.sum(sweep(ov, dv, tm)))
        t0 = time.perf_counter()
        float(jnp.sum(sweep(ov, dv, tm)))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": label,
            "lanes": int(len(o)),
            "pad_factor": round(len(o) / n_effective, 3),
            "member_evals_per_block": round(float(evals.mean()), 1),
            "total_member_evals": int(evals.sum()),
            "sweep_s": round(dt, 4),
            "mrays_per_s_effective": round(n_effective / dt / 1e6, 3),
        }), flush=True)
        return dt

    tmax_full = np.full(n, 1e16, np.float32)
    stats_and_time(ob, db, tmax_full, "baseline_sorted", n)

    # binned variants: bin id = top bits of the coherence key
    # (octant octet sits at bits 28-30; origin morton at 10-27)
    for mbits in (3, 6, 9, 12):
        shift = 28 - mbits
        bins = (keys >> np.uint32(shift)).astype(np.int64)
        # per-bin padded layout
        uniq, counts = np.unique(bins, return_counts=True)
        padded = ((counts + 127) // 128) * 128
        starts = np.zeros(len(uniq), np.int64)
        starts[1:] = np.cumsum(padded)[:-1]
        total = int(padded.sum())
        bin_index = np.searchsorted(uniq, bins)
        rank = np.arange(n) - np.searchsorted(bins, bins)  # rank within bin
        dest = starts[bin_index] + rank
        o_p = np.zeros((total, 3), np.float32)
        d_p = np.zeros((total, 3), np.float32)
        d_p[:, 0] = 1.0  # pad lanes: valid unit dir, t_max 0 retires them
        t_p = np.zeros(total, np.float32)
        o_p[dest] = ob
        d_p[dest] = db
        t_p[dest] = 1e16
        stats_and_time(o_p, d_p, t_p, f"binned_oct+{mbits}b_morton", n)


if __name__ == "__main__":
    main()
