"""Profile ONE bench frame with jax.profiler and aggregate device-op time.

Splits the frame into sweep kernels (pallas custom-calls), sorts, fusions,
copies — the measured basis for the fusion-diet work (PERF_NOTES round-2
continued-3).

Run:  python experiments/profile_frame.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import gzip
import json
import time

import numpy as np

from bench import build_city_scene


def main():
    import jax

    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
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
    cfg = RenderConfig(
        width=1200, height=800, samples_per_launch=2, max_depth=4,
        traversal="cluster", dispatch_tiles=2, sort_rays=True,
        nee_final_bounce=False, batch_spp=True,
    )
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=1200 / 800)
    r = Renderer(cs, probe, cfg, cam)
    r.render()  # compile + warm
    t0 = time.perf_counter()
    r.render()
    frame_s = time.perf_counter() - t0
    print(f"frame wall: {frame_s:.2f}s")

    out = "/tmp/jaxtrace_frame"
    with jax.profiler.trace(out):
        r.render()

    latest = max(glob.glob(out + "/plugins/profile/*"), key=os.path.getmtime)
    [trf] = glob.glob(latest + "/*.trace.json.gz")
    with gzip.open(trf) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])

    # host-python events have $file.py / np.asarray names; device op events
    # are bare HLO/kernel names
    def is_host(n):
        return n.startswith("$") or "asarray" in n or n.startswith("np.")

    agg = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        n = e.get("name", "?")
        if is_host(n) or n.startswith("jit_") or n.startswith("Pjit"):
            continue
        # strip trailing .N indices for grouping
        base = n.rstrip("0123456789.")
        a = agg.setdefault(base, [0, 0.0])
        a[0] += 1
        a[1] += e.get("dur", 0)
        total += e.get("dur", 0)
    print(f"device-op total: {total/1e6:.2f}s over {sum(a[0] for a in agg.values())} events")
    for n, (c, d) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]:
        print(f"{d/1e6:8.3f}s x{c:5d}  {n[:80]}")


if __name__ == "__main__":
    main()
