"""Tune the variance-guided denoiser on the quality-track pipeline row
(sigma_color / var_boost as TRACED scalars: one compile, full grid).

Run on TPU: PYTHONPATH=. python experiments/denoise_tune.py
"""
import json
import sys
import time

import numpy as np


ITERS = 4
DEMOD = False


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench as B
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.engine.adaptive import AdaptiveRenderer
    from optixpathtracer_tpu.engine.wavefront import RenderConfig
    from optixpathtracer_tpu.lights.probe import build_probe
    from optixpathtracer_tpu.ops.denoise import atrous_denoise

    ref_d = np.load("scenes/ref_city_600x400.npz")
    w, h = int(ref_d["width"]), int(ref_d["height"])
    ref_sqrt = np.sqrt(np.clip(ref_d["image"].astype(np.float32), 0, None))
    ref2d = jnp.asarray(ref_sqrt.reshape(h, w, 3))

    hs = B.build_city_scene(n_boxes=12500)
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    sky = np.full((64, 128, 3), 0.4, np.float32)
    sky[8:12, 30:34] = (60.0, 55.0, 45.0)
    probe = build_probe(sky)
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=w / h)
    on_cpu = jax.default_backend() == "cpu"
    cfg = RenderConfig(
        width=w, height=h, samples_per_launch=2, max_depth=4,
        traversal="lockstep" if on_cpu else "cluster", dispatch_tiles=1,
        sort_rays=not on_cpu, nee_final_bounce=False, batch_spp=True,
        sampling="stratified",
    )
    ar = AdaptiveRenderer(cs, probe, cfg, cam, warmup_spp=2, refine_spp=4,
                          refine_fraction=0.25)
    yx_np = np.asarray(ar._py) * w + np.asarray(ar._px)
    yx_np = np.where(np.asarray(ar._valid), yx_np, w * h)
    yx = jnp.asarray(yx_np)

    @jax.jit
    def rmse_grid(col, nrm, alb, dep, lum, lum2, count, sigmas, boosts, sdepths):
        nf = jnp.maximum(count.astype(jnp.float32), 1.0)

        def img(v):
            rows = jnp.stack([v.x, v.y, v.z], -1) / nf[:, None]
            buf = jnp.zeros((w * h + 1, 3), jnp.float32).at[yx].set(
                rows, mode="promise_in_bounds")
            return buf[: w * h].reshape(h, w, 3)

        mean_l = lum / nf
        var = jnp.maximum(lum2 / nf - mean_l * mean_l, 0.0) / nf
        vbuf = jnp.zeros((w * h + 1,), jnp.float32).at[yx].set(
            var, mode="promise_in_bounds")
        var2d = vbuf[: w * h].reshape(h, w)
        ic, inr, ia = img(col), img(nrm), img(alb)
        dbuf = jnp.zeros((w * h + 1,), jnp.float32).at[yx].set(
            dep / nf, mode="promise_in_bounds")
        dep2d = dbuf[: w * h].reshape(h, w)

        def one(sb):
            s, b, sd = sb
            dn = atrous_denoise(ic, inr, ia, sigma_color=s, variance=var2d,
                                var_boost=b, iterations=ITERS,
                                sigma_albedo=sd, demodulate=DEMOD)
            return jnp.sqrt(jnp.mean(
                (jnp.sqrt(jnp.clip(dn, 0, None)) - ref2d) ** 2))

        return jax.lax.map(one, (sigmas, boosts, sdepths))

    grid = [(s, 256.0, sa) for s in (1.0, 2.0, 4.0)
            for sa in (0.1, 0.25, 1.0, 1e3)]
    sigmas = jnp.asarray([g[0] for g in grid], jnp.float32)
    boosts = jnp.asarray([g[1] for g in grid], jnp.float32)
    sdepths = jnp.asarray([g[2] for g in grid], jnp.float32)

    import os
    global ITERS, DEMOD
    ITERS = int(os.environ.get("ITERS", "4"))
    DEMOD = bool(int(os.environ.get("DEMOD", "0")))
    for rounds in range(1, 12):
        ar.render()
        mean_spp = float(np.asarray(ar.count, np.float32).sum()) / (w * h)
        if rounds in (1, 3, 6, 11):
            vals = np.asarray(rmse_grid(ar.col_sum, ar.nrm_sum, ar.alb_sum,
                                        ar.dep_sum,
                                        ar.lum_sum, ar.lum2_sum, ar.count,
                                        sigmas, boosts, sdepths))
            best = int(vals.argmin())
            print(json.dumps({
                "round": rounds, "mean_spp": round(mean_spp, 2),
                "best": {"sigma": grid[best][0], "sigma_albedo": grid[best][2],
                         "rmse": round(float(vals[best]), 5)},
                "all": {f"s{g[0]}_a{g[2]}": round(float(v), 5)
                        for g, v in zip(grid, vals)},
            }), flush=True)


if __name__ == "__main__":
    main()
