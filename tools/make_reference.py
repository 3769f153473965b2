"""Generate the committed self-reference for the time-to-RMSE bench track
(VERDICT r3 item 1): the bench city at 600x400, 4096 spp, stratified
sampling (unbiased — same estimator mean as the benched rows), max_depth 4.

The artifact (scenes/ref_city_600x400.npz) stores the converged accumulation
as float16 in the renderer's CANONICAL flat order (row 0 = bottom, y-major),
i.e. exactly `Renderer.accum` unpermuted — bench.py uploads it once and
computes sqrt-space RMSE against it on-device (host transfers through the
TPU tunnel are ~0.3 MB/s; only scalars may cross per checkpoint).

Run (TPU, ~35 min):  PYTHONPATH=. python tools/make_reference.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 600, 400
TOTAL_SPP = 4096
SPP_PER_LAUNCH = 8


def main():
    from optixpathtracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench as B
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.engine.renderer import Renderer
    from optixpathtracer_tpu.engine.wavefront import RenderConfig
    from optixpathtracer_tpu.lights.probe import build_probe
    import jax

    hs = B.build_city_scene(n_boxes=12500)
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    sky = np.full((64, 128, 3), 0.4, np.float32)
    sky[8:12, 30:34] = (60.0, 55.0, 45.0)
    probe = build_probe(sky)
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=W / H)
    on_cpu = jax.default_backend() == "cpu"
    cfg = RenderConfig(
        width=W, height=H, samples_per_launch=SPP_PER_LAUNCH, max_depth=4,
        traversal="lockstep" if on_cpu else "cluster", dispatch_tiles=1,
        sort_rays=not on_cpu, nee_final_bounce=False, batch_spp=True,
        sampling="stratified",
    )
    r = Renderer(cs, probe, cfg, cam)
    n_launches = TOTAL_SPP // SPP_PER_LAUNCH
    t0 = time.perf_counter()
    for i in range(n_launches):
        r.render(download=False)
        if (i + 1) % 64 == 0:
            float(r._last.rays_traced)  # hard sync for an honest ETA
            dt = time.perf_counter() - t0
            print(f"{(i + 1) * SPP_PER_LAUNCH} spp, {dt:.0f}s "
                  f"(ETA {dt / (i + 1) * (n_launches - i - 1):.0f}s)",
                  flush=True)
    accum = np.stack([np.asarray(r.accum.x), np.asarray(r.accum.y),
                      np.asarray(r.accum.z)], -1)
    inv = np.argsort(r._perm, kind="stable")
    canonical = accum[inv]  # flat (H*W, 3), row 0 = bottom
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "ref_city_600x400.npz")
    np.savez_compressed(
        out, image=canonical.astype(np.float16), width=W, height=H,
        spp=TOTAL_SPP, max_depth=4, scene="city_12500_seed0",
        eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), fov_y=45.0,
    )
    print(f"wrote {out} mean={canonical.mean():.4f}")


if __name__ == "__main__":
    main()
