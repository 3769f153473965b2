"""A/B the quality-track composed pipeline's sampling strategy at bench
scale on the real chip: stratified (current bench.py row 2) vs sobol
(covers every bounce depth, not just depth 0).

Reports seconds + effective spp to RMSE <= 0.03 for each strategy, plus
the RMSE trajectory, so bench.py can adopt the winner with evidence.

Run: JAX_PLATFORMS='' python experiments/sobol_pipeline_ab.py
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_city_scene
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.engine.adaptive import AdaptiveRenderer
from optixpathtracer_tpu.engine.wavefront import RenderConfig
from optixpathtracer_tpu.ops.denoise import atrous_denoise


def run(strategy, cs, probe, ref_sqrt, w, h, target=0.03, rounds=48):
    on_cpu = jax.devices()[0].platform == "cpu"
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=w / h)
    cfg = RenderConfig(
        width=w, height=h, samples_per_launch=2, max_depth=4,
        traversal="lockstep" if on_cpu else "cluster", dispatch_tiles=1,
        sort_rays=not on_cpu, nee_final_bounce=False, batch_spp=True,
        sampling=strategy,
    )
    ar = AdaptiveRenderer(cs, probe, cfg, cam, warmup_spp=2, refine_spp=4,
                          refine_fraction=0.25)
    yx_np = np.asarray(ar._py) * w + np.asarray(ar._px)
    yx_np = np.where(np.asarray(ar._valid), yx_np, w * h)
    yx = jnp.asarray(yx_np)
    ref2d = jnp.asarray(ref_sqrt.reshape(h, w, 3))

    @jax.jit
    def rmse_pipeline(col, nrm, alb, lum, lum2, count):
        nf1 = jnp.maximum(count.astype(jnp.float32), 1.0)
        nf = nf1[:, None]

        def img(v):
            rows = jnp.stack([v.x, v.y, v.z], -1) / nf
            buf = jnp.zeros((w * h + 1, 3), jnp.float32).at[yx].set(
                rows, mode="promise_in_bounds")
            return buf[: w * h].reshape(h, w, 3)

        mean_l = lum / nf1
        var = jnp.maximum(lum2 / nf1 - mean_l * mean_l, 0.0) / nf1
        vbuf = jnp.zeros((w * h + 1,), jnp.float32).at[yx].set(
            var, mode="promise_in_bounds")
        dn = atrous_denoise(img(col), img(nrm), img(alb),
                            sigma_color=4.0, sigma_albedo=1.0,
                            variance=vbuf[: w * h].reshape(h, w),
                            var_boost=256.0, demodulate=True)
        return jnp.sqrt(jnp.mean((jnp.sqrt(jnp.clip(dn, 0, None)) - ref2d) ** 2))

    def rmse_p(a):
        return float(rmse_pipeline(a.col_sum, a.nrm_sum, a.alb_sum,
                                   a.lum_sum, a.lum2_sum, a.count))

    # compile both launch shapes on a throwaway, then time fresh
    ar.render(); rmse_p(ar); ar.render(); rmse_p(ar)
    ar2 = AdaptiveRenderer(cs, probe, cfg, cam, warmup_spp=2, refine_spp=4,
                           refine_fraction=0.25)
    t = 0.0
    traj = []
    hit = None
    for i in range(rounds):
        t0 = time.perf_counter()
        ar2.render()
        v = rmse_p(ar2)
        t += time.perf_counter() - t0
        spp = float(np.asarray(ar2.count, np.float32).sum()) / (w * h)
        traj.append((round(t, 2), round(v, 5), round(spp, 2)))
        if v <= target and hit is None:
            hit = (round(t, 2), round(spp, 2))
            break
    return hit, traj


def main():
    ref_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "ref_city_600x400.npz")
    ref_d = np.load(ref_path)
    w, h = int(ref_d["width"]), int(ref_d["height"])
    ref_sqrt = np.sqrt(np.clip(ref_d["image"].astype(np.float32), 0, None))
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.lights.probe import build_probe

    hs = build_city_scene()
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    sky = np.full((64, 128, 3), 0.4, np.float32)
    sky[8:12, 30:34] = (60.0, 55.0, 45.0)
    probe = build_probe(sky)
    for strategy in ("stratified", "sobol"):
        hit, traj = run(strategy, cs, probe, ref_sqrt, w, h)
        print(f"{strategy}: hit={hit}")
        print(f"  trajectory: {traj}")


if __name__ == "__main__":
    main()
