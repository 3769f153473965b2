"""Where does the FLAT cluster backend actually stop winning/compiling?

Round-5 follow-up to hier_probe.py: at 1.35M tris (657 entries) the flat
path still compiles and beats hier 2.8-3.3x (camera 2.98 vs 0.91, bounce
0.739 vs 0.266 Mrays/s/sweep).  This probes 2x and 4x that scale so the
HIER_MIN_ENTRIES routing threshold is set by measurement, not guess.

Exactness at these scales is gated flat-vs-hier (two independent walks, each
dense-oracle-gated at 1.35M by hier_probe/test_traverse_hier) over mixed
camera+bounce rays.

Run (TPU):  PYTHONPATH=. python experiments/flat_scale_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from optixpathtracer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

import bench as B
from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.ops.traverse_cluster import closest_hit_cluster
from experiments.hier_probe import make_rays, v3, sweep_rate


def probe(tag, terrain_grid, n_boxes=12500, gate_n=4096):
    t0 = time.perf_counter()
    hs = B.build_big_scene(n_boxes=n_boxes, terrain_grid=terrain_grid)
    cs = compile_scene(hs, leaf_size=8, wide_width=8, build_wide_bvh=False,
                      cluster_size=256)
    build_s = time.perf_counter() - t0
    cam = Camera(eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
                 fov_y=45, aspect_ratio=1.5)
    cl = cs.clusters
    print(f"== {tag}: {cs.num_triangles} tris, {cl.num_entries} entries, "
          f"{-(-cl.num_entries // 8)} nodes, build {build_s:.1f}s", flush=True)
    ocam, dcam, ob, db = make_rays(cs, cam)

    og = np.concatenate([ocam[:gate_n // 2], ob[:gate_n // 2]])
    dg = np.concatenate([dcam[:gate_n // 2], db[:gate_n // 2]])

    # NOTE: cl is a jit ARGUMENT (pytree), not a closure constant — closing
    # over it embeds the geometry as dense HLO constants, which is what
    # blew the tunnel's remote-compile payload limit (HTTP 413) at 4.5M
    # tris on the first cut of this probe. The engine's _render_step
    # already passes CompiledScene as an argument (renderer.py:32).
    rates = {}
    for mode in (False, True):
        name = "hier" if mode else "flat"
        try:
            t0 = time.perf_counter()
            fh = jax.jit(lambda c, ov, dv, m=mode: closest_hit_cluster(
                c, ov, dv, 1e-3, 1e16, hier=m).tri)
            got = fh(cl, *map(v3, (og, dg)))
            print(f"  {name}: compiled+ran in {time.perf_counter()-t0:.0f}s",
                  flush=True)
            rates[name] = got
        except Exception as e:
            print(f"  {name}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if len(rates) == 2:
        mm = int((np.asarray(rates["flat"]) != np.asarray(rates["hier"])).sum())
        print(f"  flat-vs-hier exactness: {mm} mismatches of {gate_n}", flush=True)

    for mode in (False, True):
        name = "hier" if mode else "flat"
        if name not in rates:
            continue
        for rname, o, d in (("camera", ocam, dcam), ("bounce_sorted", ob, db)):
            fh = jax.jit(lambda c, ov, dv, m=mode: closest_hit_cluster(
                c, ov, dv, 1e-3, 1e16, hier=m).t)
            try:
                r = sweep_rate(lambda ov, dv: fh(cl, ov, dv), o, d)
                print(f"  {name} {rname}: {r:.3f} Mrays/s/sweep", flush=True)
            except Exception as e:
                print(f"  {name} {rname}: FAILED {type(e).__name__}", flush=True)


def main():
    import sys as _sys
    if "--4x-only" not in _sys.argv:
        # 2.1M terrain tris + 0.3M city  ->  ~2.4M
        probe("big2x-2.4M", (2048, 512))
    # 4.2M terrain tris + 0.3M city  ->  ~4.5M
    probe("big4x-4.5M", (2048, 1024))
    if "--8x" in _sys.argv:
        # ~8.7M: san_miguel scale (the reference's largest, ~10M)
        probe("big8x-8.7M", (2048, 2048))


if __name__ == "__main__":
    main()
