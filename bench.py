"""Benchmark: incoherent-ray throughput of the Disney wavefront path tracer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's headline config (BASELINE.md): 1200x800
frame, Disney path tracing with probe NEE, max depth 4, on a procedural
box-city scene sized like lost_empire.obj (~150k triangles; the reference's
scene files are external hard-coded Windows paths and not in the repo, so a
same-scale procedural stand-in is used). The metric counts every traced ray
(radiance + shadow) exactly, as accumulated on-device by the wavefront loop.

vs_baseline is against the 100 Mrays/s north-star target (BASELINE.json) —
the reference publishes no Mrays/s number of its own.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_city_scene(n_boxes=12500, seed=0):
    """~12.5k boxes x 12 tris = 150k triangles, lost_empire scale."""
    from optixpathtracer_tpu.core.materials import make_material
    from optixpathtracer_tpu.core.scene import HostScene, Mesh

    rng = np.random.default_rng(seed)
    hs = HostScene()

    # ground slab
    hs.add_box(make_material(color=(0.75, 0.75, 0.75)), pos=(0, -0.5, 0), extent=(60, 0.5, 60))

    # one fused mesh of random boxes (one material per color bucket)
    centers = rng.uniform(-50, 50, size=(n_boxes, 2)).astype(np.float32)
    heights = rng.gamma(2.0, 1.2, size=n_boxes).astype(np.float32) + 0.3
    widths = rng.uniform(0.2, 0.9, size=(n_boxes, 2)).astype(np.float32)

    # build 8 material buckets, each a single fused mesh
    n_buckets = 8
    bucket = rng.integers(0, n_buckets, n_boxes)
    base = np.array(
        [[0.8, 0.3, 0.2], [0.2, 0.7, 0.3], [0.25, 0.35, 0.8], [0.8, 0.75, 0.3],
         [0.6, 0.6, 0.6], [0.8, 0.5, 0.2], [0.4, 0.2, 0.6], [0.7, 0.7, 0.9]],
        np.float32,
    )
    unit_v, unit_f = _unit_box()
    for b in range(n_buckets):
        idx = np.nonzero(bucket == b)[0]
        if len(idx) == 0:
            continue
        k = len(idx)
        scale = np.stack([widths[idx, 0], heights[idx] * 0.5, widths[idx, 1]], -1)
        offset = np.stack(
            [centers[idx, 0], heights[idx] * 0.5, centers[idx, 1]], -1
        )
        verts = unit_v[None] * scale[:, None, :] + offset[:, None, :]
        faces = unit_f[None] + (np.arange(k)[:, None, None] * len(unit_v))
        mat = make_material(color=tuple(base[b]), roughness=float(rng.uniform(0.3, 0.9)))
        hs.add_mesh(
            Mesh(
                vertices=verts.reshape(-1, 3).astype(np.float32),
                indices=faces.reshape(-1, 3).astype(np.int32),
                material=mat,
            )
        )
    return hs


def _unit_box():
    v = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
        np.float32,
    )
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
         [3, 2, 6], [3, 6, 7], [0, 3, 7], [0, 7, 4], [1, 5, 6], [1, 6, 2]],
        np.int32,
    )
    return v, f


def main():
    # allow CPU fallback for local smoke runs: bench.py --cpu
    if "--cpu" in sys.argv:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.engine.renderer import Renderer
    from optixpathtracer_tpu.engine.wavefront import RenderConfig
    from optixpathtracer_tpu.lights.probe import build_probe

    small = "--small" in sys.argv
    # --scene loft: the bundled CLOSED textured interior (round-1 verdict:
    # the open-sky city flatters traversal and under-tests emissives /
    # textures at bench scale). Secondary number; the city stays headline.
    loft = False
    if "--scene" in sys.argv:
        i = sys.argv.index("--scene")
        if i + 1 >= len(sys.argv):
            print("usage: bench.py [--small] [--cpu] [--scene city|loft]",
                  file=sys.stderr)
            sys.exit(2)
        loft = sys.argv[i + 1] == "loft"
    width, height = (320, 240) if small else (1200, 800)
    spp = 1 if small else 2
    n_boxes = 400 if small else 12500

    if loft:
        from optixpathtracer_tpu.io.obj import load_obj

        hs = load_obj(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "scenes", "loft.obj"))
        scene_label = "loft interior"
    else:
        hs = build_city_scene(n_boxes=n_boxes)
        scene_label = "150k-tri city"
    t0 = time.perf_counter()
    # cluster_size 256: fatter (128, 256) M-T evals amortize the per-eval
    # issue overhead (measured: 64 is 1.5x worse, 256 ~4% better than 128)
    cs = compile_scene(
        hs, leaf_size=8, wide_width=8, build_wide_bvh=False, cluster_size=256
    )
    build_s = time.perf_counter() - t0

    if loft:
        # closed room: lit by its emissive panels, not the sky
        probe = build_probe(np.full((8, 16, 3), 1e-6, np.float32))
    else:
        # sky probe with a sun
        sky = np.full((64, 128, 3), 0.4, np.float32)
        sky[8:12, 30:34] = (60.0, 55.0, 45.0)
        probe = build_probe(sky)

    # cluster backend (exact, gather-free Pallas sweep — see
    # ops/traverse_cluster.py); dispatch chunks stay under the TPU tunnel's
    # per-dispatch RPC deadline
    on_cpu = jax.default_backend() == "cpu"
    cfg = RenderConfig(
        width=width, height=height, samples_per_launch=spp, max_depth=4,
        traversal="lockstep" if on_cpu else "cluster",
        # bigger dispatches = denser sorted wavefronts (measured: 2 tiles
        # 1.026 vs 4 tiles 0.976 Mrays/s; 1 tile equal to 2)
        dispatch_tiles=1 if small else 2,
        # measured-best flag set (PERF_NOTES round-2): ray-stream sorting on;
        # fused_shadows measured a LOSS (the combined closest sweep forfeits
        # the any-hit kernel's first-hit exit); batch_spp neutral at this size
        sort_rays=not on_cpu,
        # skip the final bounce's NEE statically — the reference traces those
        # shadow rays then DISCARDS their contribution (deviceProgram.cu:
        # 429-437); measured 5.01 -> 4.72 s/frame, 1.365 -> 1.412 Mrays/s
        nee_final_bounce=False,
        # one expanded pixels-x-samples wavefront per launch: halves the
        # per-dispatch fixed costs (was neutral pre-slab; now +1%)
        batch_spp=not small,
        emission_all_bounces=loft,
        use_shading_normals=loft,
    )
    if loft:
        cam = Camera(
            eye=(-5.2, 2.4, 3.2), lookat=(2.0, 1.2, -1.0), up=(0, 1, 0),
            fov_y=55, aspect_ratio=width / height,
        )
    else:
        cam = Camera(
            eye=(55.0, 18.0, 55.0), lookat=(0.0, 2.0, 0.0), up=(0, 1, 0),
            fov_y=45, aspect_ratio=width / height,
        )

    # ---- quality gate 1: traversal exactness at bench scale -------------
    # the headline number is only admissible if the fast backend agrees
    # EXACTLY with the dense no-cull oracle on this very scene (round-1
    # lesson: a Mrays/s figure from a truncating traversal is not a
    # legitimate perf point). 8k mixed rays: camera rays + scene-interior
    # bounce-like rays.
    gate_mismatch = 0
    if not on_cpu:
        from optixpathtracer_tpu.core.math import Vec3
        from optixpathtracer_tpu.ops.traverse_cluster import (
            closest_hit_cluster,
            reference_closest,
        )

        rng = np.random.default_rng(42)
        n_g = 8192
        half = n_g // 2
        uu, vv, ww = cam.uvw_frame()
        sx = rng.uniform(-1, 1, (half, 1))
        sy = rng.uniform(-1, 1, (half, 1))
        dcam = sx * uu[None] + sy * vv[None] + ww[None]
        ocam = np.broadcast_to(np.asarray(cam.eye, np.float32), (half, 3))
        # interior bounce-like origins: uniform in the (slightly shrunk)
        # scene bbox, so the gate exercises the scene actually benched
        all_v = np.concatenate([m.vertices for m in hs.meshes])
        lo, hi = all_v.min(0), all_v.max(0)
        c, half_ext = (lo + hi) / 2, (hi - lo) / 2
        obnc = c + rng.uniform(-0.85, 0.85, (half, 3)) * half_ext
        dbnc = rng.normal(0, 1, (half, 3))
        og = np.concatenate([ocam, obnc]).astype(np.float32)
        dg = np.concatenate([dcam, dbnc]).astype(np.float32)
        dg /= np.linalg.norm(dg, axis=1, keepdims=True)
        ov = Vec3(*(jnp.asarray(og[:, i]) for i in range(3)))
        dv = Vec3(*(jnp.asarray(dg[:, i]) for i in range(3)))
        fast = closest_hit_cluster(cs.clusters, ov, dv, 1e-3, 1e16)
        exact = reference_closest(cs.clusters, ov, dv, 1e-3, 1e16)
        gate_mismatch = int(
            (np.asarray(fast.tri) != np.asarray(exact.tri)).sum()
        )

    r = Renderer(cs, probe, cfg, cam)

    # warmup / compile
    t0 = time.perf_counter()
    r.render()
    compile_s = time.perf_counter() - t0

    # multi-device: the day the environment offers a slice, the record
    # captures it with zero changes — strip-DP over every device whose
    # count divides the pixel grid, plus a single-device reference frame
    # for the scaling-efficiency denominator (ref scaffold:
    # sutil/WorkDistribution.h:34-87)
    n_dev_avail = len(jax.devices())
    multi = n_dev_avail > 1
    frames = 2 if small else 4
    rays = 0.0
    overflow = 0.0
    scaling = None
    if multi:
        from optixpathtracer_tpu.parallel.tiles import (
            DistributedRenderer,
            make_mesh,
        )

        devs = list(jax.devices())
        while (width * height) % len(devs):
            devs = devs[:-1]
        dr = DistributedRenderer(cs, probe, cfg, cam, mesh=make_mesh(devs))
        dr.render()  # compile + warm
        # single-device reference frame (r is already warm)
        t0 = time.perf_counter()
        r.render()
        single_dt = time.perf_counter() - t0
        single_mrays = float(r._last.rays_traced) / single_dt / 1e6
        overflow += float(r._last.bfs_overflow)
        t0 = time.perf_counter()
        for _ in range(frames):
            dr.render()
            rays += dr.last_rays
        dt = time.perf_counter() - t0
        mrays = rays / dt / 1e6
        scaling = {
            "n_devices": len(devs),
            "single_device_mrays": round(single_mrays, 3),
            "scaling_efficiency": round(
                mrays / (len(devs) * single_mrays), 4
            ) if single_mrays > 0 else 0.0,
        }
    else:
        # timed progressive frames
        t0 = time.perf_counter()
        for _ in range(frames):
            r.render()
            rays += float(r._last.rays_traced)
            overflow += float(r._last.bfs_overflow)
        dt = time.perf_counter() - t0
        mrays = rays / dt / 1e6
    fps = frames / dt

    # ---- quality gates: refuse a headline number from wrong images ------
    gated_out = (overflow != 0.0) or (gate_mismatch != 0)
    result = {
        "metric": f"Mrays/s incoherent (Disney PT, depth 4, {scene_label}, 1200x800)",
        "value": 0.0 if gated_out else round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": 0.0 if gated_out else round(mrays / 100.0, 4),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "fps": round(fps, 4),
                    "spp_per_launch": spp,
                    "rays_total": rays,
                    "traversal": cfg.traversal,
                    "overflow": overflow,
                    "gate_mismatch_rays": gate_mismatch,
                    "quality_gated_out": gated_out,
                    "bvh_build_s": round(build_s, 2),
                    "first_frame_incl_compile_s": round(compile_s, 2),
                    "triangles": cs.num_triangles,
                    "devices": [str(d) for d in jax.devices()][:4],
                    "scaling": scaling,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
