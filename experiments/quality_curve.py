"""Size the time-to-RMSE bench protocol (VERDICT r3 item 1).

Measures, on the real TPU, at a reduced bench-scene resolution:
  * uniform-random progressive convergence: RMSE (sqrt space) vs a running
    high-spp tail reference, and wall-clock per launch;
  * the same with stratified sampling;
  * the denoiser's RMSE at each checkpoint (floor + crossover);
Writes /tmp/quality_curve.npz + prints a table.
"""
import json
import sys
import time

import numpy as np

W, H = 600, 400
SPP_LAUNCH = 2
CHECKPOINTS = [1, 2, 4, 8, 16, 32, 64, 128, 256]  # subframes (x2 spp each)


def main():
    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench as B
    import dataclasses
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.engine.renderer import Renderer
    from optixpathtracer_tpu.engine.wavefront import RenderConfig
    from optixpathtracer_tpu.lights.probe import build_probe
    from optixpathtracer_tpu.ops.denoise import atrous_denoise

    hs = B.build_city_scene(n_boxes=12500)
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    sky = np.full((64, 128, 3), 0.4, np.float32)
    sky[8:12, 30:34] = (60.0, 55.0, 45.0)
    probe = build_probe(sky)
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=W / H)
    on_cpu = jax.default_backend() == "cpu"
    base_cfg = RenderConfig(
        width=W, height=H, samples_per_launch=SPP_LAUNCH, max_depth=4,
        traversal="lockstep" if on_cpu else "cluster",
        dispatch_tiles=1, sort_rays=not on_cpu, nee_final_bounce=False,
        batch_spp=True,
    )

    results = {}
    for mode in ("random", "stratified"):
        cfg = dataclasses.replace(base_cfg, sampling=mode)
        r = Renderer(cs, probe, cfg, cam)
        r.render(download=False)  # compile
        # reset accumulation after warm-up
        r.resize(W, H)
        imgs, dns, times, aovs = [], [], [], None
        t_total = 0.0
        sub = 0
        for ck in CHECKPOINTS:
            t0 = time.perf_counter()
            while sub < ck:
                r.render(download=False)
                sub += 1
            # hard sync: fetch a scalar
            float(r._last.rays_traced)
            t_total += time.perf_counter() - t0
            img = r.accum_image()
            imgs.append(img)
            times.append(t_total)
            aov = r.aovs()
            dn = np.asarray(atrous_denoise(
                jnp.asarray(img), jnp.asarray(aov["normal"]),
                jnp.asarray(aov["albedo"])))
            dns.append(dn)
            print(f"{mode} spp={ck*SPP_LAUNCH:5d} t={t_total:8.1f}s", flush=True)
        results[mode] = dict(imgs=np.stack(imgs).astype(np.float16),
                             dns=np.stack(dns).astype(np.float16),
                             times=np.asarray(times))

    np.savez_compressed("/tmp/quality_curve.npz",
                        **{f"{m}_{k}": v for m, d in results.items()
                           for k, v in d.items()})

    # table: RMSE (sqrt space) vs the last stratified image as provisional ref
    ref = np.sqrt(np.clip(results["stratified"]["imgs"][-1].astype(np.float32), 0, None))
    for mode in ("random", "stratified"):
        for i, ck in enumerate(CHECKPOINTS):
            a = np.sqrt(np.clip(results[mode]["imgs"][i].astype(np.float32), 0, None))
            d = np.sqrt(np.clip(results[mode]["dns"][i].astype(np.float32), 0, None))
            print(json.dumps({
                "mode": mode, "spp": ck * SPP_LAUNCH,
                "t": round(float(results[mode]["times"][i]), 1),
                "rmse": round(float(np.sqrt(np.mean((a - ref) ** 2))), 5),
                "rmse_dn": round(float(np.sqrt(np.mean((d - ref) ** 2))), 5),
            }), flush=True)


if __name__ == "__main__":
    main()
