"""Foveation speed-up at the reference's OWN headline config: 3840x2160.

The reference's 11-21x foveated-vs-uniform claim (BASELINE.md; VMV'23,
final_fps.dat) was measured at 3840x2160 with the sv4 3-zone pattern
(periphery 1/4-res 1 spp / ring 1/2-res 2 spp / fovea full-res 8 spp,
radii 157/515, depth 4) against uniform 8 spp. Our earlier 4.3x was at
1200x800 — where the IDEAL ray-count ratio with those radii is only ~5.5x
(the fovea+ring cover a much larger fraction of a small frame). At 4K the
ideal ratio is ~36x, so this is the apples-to-apples reproduction.

Run (real TPU):  python experiments/fov_4k.py [--frames N] [--skip-uniform]
                 [--res WxH] [--fused] [--tiles N]

--res 1200x800 reproduces the bench-scale comparison (ideal ratio ~5.5x).

Timing hygiene: through the axon tunnel block_until_ready() returns before
the remote computation finishes — every timed region fetches a scalar.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_city_scene

W, H = 3840, 2160


def main():
    global W, H
    frames = 3
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    if "--res" in sys.argv:
        W, H = map(int, sys.argv[sys.argv.index("--res") + 1].split("x"))
    tiles = 64
    if "--tiles" in sys.argv:
        tiles = int(sys.argv[sys.argv.index("--tiles") + 1])

    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.engine.foveated import FoveatedRenderer, FoveationConfig
    from optixpathtracer_tpu.engine.renderer import Renderer
    from optixpathtracer_tpu.engine.wavefront import RenderConfig
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

    base = dict(
        width=W, height=H, max_depth=4, traversal="cluster", sort_rays=True,
        nee_final_bounce=False, batch_spp=True,
    )

    # ---- foveated: sv4 3-zone, reference radii 157/515 ------------------
    fused = "--fused" in sys.argv
    fcfg = RenderConfig(samples_per_launch=8, **base)
    fov = FoveatedRenderer(cs, probe, fcfg, cam, FoveationConfig(), fused=fused)
    zones = fov.zones
    ideal_fov_rays = sum(z.grid_w * z.grid_h * z.spp for z in zones)
    ideal_uni_rays = W * H * 8
    print(f"zones: {[(z.name, z.grid_w, z.grid_h, z.spp) for z in zones]}")
    print(f"ideal primary-sample ratio: {ideal_uni_rays / ideal_fov_rays:.1f}x")

    fov.render()  # compile all three zone programs
    t0 = time.perf_counter()
    frays = 0.0
    for _ in range(frames):
        fov.render()  # render() fetches rays_traced per zone -> hard sync
        frays += fov.last_rays
    fov_s = (time.perf_counter() - t0) / frames
    print(f"foveated: {fov_s:.2f} s/frame, {frays / frames / fov_s / 1e6:.3f} Mrays/s "
          f"({frays / frames / 1e6:.1f} Mrays/frame)")

    if "--skip-uniform" in sys.argv:
        return

    # ---- uniform 8 spp ---------------------------------------------------
    # 64 dispatch tiles keep each chunk ~1M expanded rays (the measured
    # sweet spot) and each device RPC a few seconds.
    ucfg = RenderConfig(samples_per_launch=8, dispatch_tiles=tiles, **base)
    uni = Renderer(cs, probe, ucfg, cam)
    t0 = time.perf_counter()
    uni.render(download=False)
    _ = float(uni._last.rays_traced)
    print(f"uniform first frame (incl compile): {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    uni.render(download=False)
    urays = float(uni._last.rays_traced)
    uni_s = time.perf_counter() - t0
    print(f"uniform: {uni_s:.2f} s/frame, {urays / uni_s / 1e6:.3f} Mrays/s "
          f"({urays / 1e6:.1f} Mrays/frame)")
    print(f"SPEED-UP foveated vs uniform at {W}x{H}: {uni_s / fov_s:.1f}x "
          f"(reference band at 4K: 11-21x)")


if __name__ == "__main__":
    main()
