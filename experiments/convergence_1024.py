"""North-star second clause, measured DIRECTLY at 1024 spp (BASELINE.md:34-35):
"matching CUDA renders within 1e-3 RMSE at 1024 spp".

With no CUDA hardware in this environment the cross-implementation stand-in
is the exact CPU lockstep traversal (a different platform, compiler, and
traversal algorithm): identical RNG streams, so the only divergence sources
are platform transcendental ULPs and op-order float drift — the same class
of divergence a CUDA-vs-TPU comparison would measure on matched estimators.
CONVERGENCE.md's earlier 256-spp point (RMSE 1.15e-3) extrapolated ~1/sqrt(spp);
this script measures the 1024-spp point directly.

Usage:
  python experiments/convergence_1024.py --platform cpu  --out /tmp/conv_cpu.npz
  python experiments/convergence_1024.py --platform tpu  --out /tmp/conv_tpu.npz
  python experiments/convergence_1024.py --compare /tmp/conv_tpu.npz /tmp/conv_cpu.npz
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(args):
    import jax

    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.engine.renderer import Renderer
    from optixpathtracer_tpu.engine.wavefront import RenderConfig
    from optixpathtracer_tpu.lights.lights import QuadLight
    from optixpathtracer_tpu.lights.probe import build_probe
    from optixpathtracer_tpu.utils.cache import enable_compilation_cache
    from tests.golden_scenes import _cornell_scene

    enable_compilation_cache()
    w = h = args.size
    cs = compile_scene(_cornell_scene())
    probe = build_probe(np.full((8, 16, 3), 0.0, np.float32) + 1e-6)
    light = QuadLight.make(
        corner=(-0.5, 2.96, -0.5), v1=(1.0, 0, 0), v2=(0, 0, 1.0),
        emission=(15.0, 13.0, 10.0),
    )
    cfg = RenderConfig(
        width=w, height=h, samples_per_launch=4, max_depth=3,
        traversal="cluster" if args.platform == "tpu" else "lockstep",
        emission_all_bounces=True,
    )
    cam = Camera(eye=(0, 1.5, 5.6), lookat=(0, 1.4, 0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=w / h)
    r = Renderer(cs, probe, cfg, cam, area_light=light)
    print(f"devices: {jax.devices()}", flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--out")
    ap.add_argument("--compare", nargs=2)
    args = ap.parse_args()

    if args.compare:
        a = np.load(args.compare[0])["image"].astype(np.float64)
        b = np.load(args.compare[1])["image"].astype(np.float64)
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))
        # tone-mapped space too (the display-referred comparison)
        ta, tb = np.sqrt(np.clip(a, 0, None)), np.sqrt(np.clip(b, 0, None))
        trmse = float(np.sqrt(np.mean((ta - tb) ** 2)))
        print(f"RMSE linear={rmse:.3e}  tonemapped={trmse:.3e}  "
              f"(north-star clause: <= 1e-3 at 1024 spp)")
        return

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    r = build(args)
    frames = args.spp // 4
    t0 = time.perf_counter()
    for i in range(frames):
        r.render()
        if (i + 1) % 32 == 0:
            print(f"{(i + 1) * 4} spp, {time.perf_counter() - t0:.0f}s",
                  flush=True)
    img = r.accum_image()
    np.savez_compressed(args.out, image=np.asarray(img, np.float32))
    print(f"wrote {args.out} ({args.spp} spp in {time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
