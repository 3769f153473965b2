"""Per-zone cost decomposition of the foveated frame at bench scale.

Times each of the 3 sv4 zone launches separately (hard-synced via the
rays_traced scalar fetch) and reports per-zone Mrays/s, to locate the
foveated-vs-uniform per-ray cost excess (uniform runs ~1.9 Mrays/s at
1200x800; foveated ~1.3 — which zone pays?).

Run (real TPU): python experiments/fov_zone_decomp.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from bench import build_city_scene

W, H = 1200, 800


def main():
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.core.math import Vec3
    from optixpathtracer_tpu.engine.foveated import (
        FoveationConfig, _zone_step)
    from optixpathtracer_tpu.engine.wavefront import CameraParams, RenderConfig
    from optixpathtracer_tpu.lights.probe import build_probe
    from optixpathtracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    hs = build_city_scene(n_boxes=12500)
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                       cluster_size=256)
    sky = np.full((64, 128, 3), 0.4, np.float32)
    sky[8:12, 30:34] = (60.0, 55.0, 45.0)
    probe = build_probe(sky)
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=W / H)
    cfg = RenderConfig(width=W, height=H, max_depth=4, traversal="cluster",
                       sort_rays=True, nee_final_bounce=False, batch_spp=True,
                       samples_per_launch=8)
    zones = FoveationConfig().zones(W, H)
    camp = CameraParams.from_camera(cam)
    gaze = jnp.asarray([W // 2, H // 2], jnp.int32)
    accum = Vec3.zeros((W * H,))
    sub = jnp.uint32(1)

    for zone in zones:
        a, r = _zone_step(cs, probe, cfg, zone, camp, gaze, accum, sub)
        _ = float(r)  # compile + hard sync
        t0 = time.perf_counter()
        iters = 3
        rays = 0.0
        for _i in range(iters):
            a, r = _zone_step(cs, probe, cfg, zone, camp, gaze, accum, sub)
            rays += float(r)
        dt = (time.perf_counter() - t0) / iters
        lanes = zone.grid_w * zone.grid_h * zone.spp
        print(f"{zone.name:10s} lanes={lanes/1e6:6.2f}M "
              f"rays/frame={rays/iters/1e6:6.2f}M  {dt:6.2f} s  "
              f"{rays/iters/dt/1e6:5.2f} Mrays/s")


if __name__ == "__main__":
    main()
