"""TLAS/BLAS instancing (reference: per-mesh GAS + IAS with per-instance
transforms + sbtOffset, sutil/Scene.cpp:776-1150).

The instanced path stores the prototype geometry ONCE and must trace and
render identically to the same scene with every instance's geometry baked
(transformed + concatenated on the host)."""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from optixpathtracer_tpu.builder import compile_instanced, compile_scene
from optixpathtracer_tpu.bvh.clusters import update_instance_transforms, _cluster_tables
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.materials import make_material
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.core.scene import HostScene, Mesh
from optixpathtracer_tpu.engine.renderer import Renderer
from optixpathtracer_tpu.engine.wavefront import RenderConfig
from optixpathtracer_tpu.lights.probe import build_probe
from optixpathtracer_tpu.ops.traverse_cluster import closest_hit_cluster


def _proto():
    hs = HostScene()
    hs.add_box(make_material(color=(0.7, 0.3, 0.2), roughness=0.4),
               pos=(0, 0.5, 0), extent=(0.5, 0.5, 0.5))
    hs.add_box(make_material(color=(0.3, 0.5, 0.8), metallic=1.0, roughness=0.2),
               pos=(0.9, 0.3, 0.2), extent=(0.3, 0.3, 0.3))
    return hs


def _transforms(n=100, seed=0):
    """n rigid+scale transforms scattered over a ground plane."""
    rng = np.random.default_rng(seed)
    xfs = np.zeros((n, 4, 4), np.float64)
    for i in range(n):
        ang = rng.uniform(0, 2 * np.pi)
        sc = rng.uniform(0.6, 1.6)
        c, s = np.cos(ang), np.sin(ang)
        xfs[i, :3, :3] = sc * np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        xfs[i, :3, 3] = (rng.uniform(-20, 20), 0.0, rng.uniform(-20, 20))
        xfs[i, 3, 3] = 1.0
    return xfs


def _baked(hs: HostScene, xfs: np.ndarray) -> HostScene:
    out = HostScene()
    flat_meshes = hs.meshes
    for xf in xfs:
        a, b = xf[:3, :3], xf[:3, 3]
        for m in flat_meshes:
            out.add_mesh(
                Mesh(
                    vertices=(m.vertices @ a.T + b).astype(np.float32),
                    indices=m.indices.copy(),
                    normals=None if m.normals is None else
                    (m.normals @ np.linalg.inv(a)).astype(np.float32),
                    texcoords=None if m.texcoords is None else m.texcoords.copy(),
                    material=dict(m.material),
                )
            )
    return out


def _rays(n=2048, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.1, 6.0, n)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*(jnp.asarray(o[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
    )


@pytest.mark.slow
def test_instanced_traversal_matches_baked():
    """100 instances, ONE stored copy of the mesh: hit distances must match
    the baked-geometry scene (which stores 100 copies)."""
    hs = _proto()
    xfs = _transforms(100)
    ci = compile_instanced(hs, xfs, cluster_size=64)
    cb = compile_scene(_baked(hs, xfs), cluster_size=64, build_wide_bvh=False)
    # geometry is stored once: rows for 100 instances == rows for 1 prototype
    assert ci.clusters.rows.shape[0] < cb.clusters.rows.shape[0]
    assert ci.clusters.num_entries == 100 * ci.clusters.num_supers

    o, d = _rays()
    ri = closest_hit_cluster(ci.clusters, o, d, 1e-3, 1e16, interpret=True)
    rb = closest_hit_cluster(cb.clusters, o, d, 1e-3, 1e16, interpret=True)
    hit_i = np.asarray(ri.tri) >= 0
    hit_b = np.asarray(rb.tri) >= 0
    assert (hit_i == hit_b).all()
    # t agrees to float tolerance (kernel transforms rays; bake transforms verts)
    np.testing.assert_allclose(
        np.asarray(ri.t)[hit_b], np.asarray(rb.t)[hit_b], rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_instanced_render_matches_baked():
    hs = _proto()
    xfs = _transforms(25)
    ci = compile_instanced(hs, xfs, cluster_size=64)
    cb = compile_scene(_baked(hs, xfs), cluster_size=64, build_wide_bvh=False)
    probe = build_probe(np.full((16, 32, 3), 0.6, np.float32))
    cfg = RenderConfig(width=64, height=48, samples_per_launch=2, max_depth=2,
                       traversal="cluster")
    cam = Camera(eye=(18, 12, 18), lookat=(0, 0, 0), up=(0, 1, 0), fov_y=50,
                 aspect_ratio=64 / 48)
    a = Renderer(ci, probe, cfg, cam)
    a.render()
    b = Renderer(cb, probe, cfg, cam)
    b.render()
    ia, ib = a.accum_image(), b.accum_image()
    rmse = float(np.sqrt(np.mean((ia - ib) ** 2)))
    assert rmse < 2e-3, rmse


@pytest.mark.slow
def test_dynamic_transform_update_no_rebuild():
    """Moving instances must not rebuild geometry: rows is the SAME array."""
    hs = _proto()
    xfs = _transforms(10)
    ci = compile_instanced(hs, xfs, cluster_size=64)
    flat = hs.flatten()
    v0, v1, v2 = flat["v"]
    from optixpathtracer_tpu.bvh.morton import np_morton_codes

    order = np.argsort(np_morton_codes((np.asarray(v0, np.float64) + v1 + v2) / 3.0), kind="stable")
    pad_to = ci.clusters.num_supers * 8 * 64
    if pad_to > len(order):
        order = np.concatenate([order, np.repeat(order[-1:], pad_to - len(order))])
    tables = _cluster_tables(
        np.asarray(v0)[order], np.asarray(v1)[order], np.asarray(v2)[order],
        pad_to, 64,
    )
    xfs2 = _transforms(10, seed=9)
    moved = update_instance_transforms(ci.clusters, tables, xfs2)
    assert moved.rows is ci.clusters.rows  # BLAS untouched

    # and it matches a fresh instanced compile with the new transforms
    ci2 = compile_instanced(hs, xfs2, cluster_size=64)
    o, d = _rays(1024, seed=4)
    r1 = closest_hit_cluster(moved, o, d, 1e-3, 1e16, interpret=True)
    r2 = closest_hit_cluster(ci2.clusters, o, d, 1e-3, 1e16, interpret=True)
    assert (np.asarray(r1.tri) == np.asarray(r2.tri)).all()
