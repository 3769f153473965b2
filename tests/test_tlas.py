"""General multi-BLAS TLAS (reference: per-mesh GAS pool + IAS with
per-instance transform + sbtOffset, sutil/Scene.cpp:776-1150).

Multiple DIFFERENT prototypes, each stored once, instanced with independent
transforms — must trace and render identically to the fully baked scene.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from optixpathtracer_tpu.builder import compile_scene, compile_tlas
from optixpathtracer_tpu.bvh.clusters import update_tlas_transforms
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.materials import make_material
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.core.scene import HostScene, Mesh
from optixpathtracer_tpu.engine.renderer import Renderer
from optixpathtracer_tpu.engine.wavefront import RenderConfig
from optixpathtracer_tpu.lights.probe import build_probe
from optixpathtracer_tpu.ops.traverse_cluster import closest_hit_cluster


def _host_with_protos():
    """One HostScene: prototype 0 = two boxes (meshes 0, 1), prototype 1 =
    a tetrahedron (mesh 2). Returns (host, groups)."""
    hs = HostScene()
    hs.add_box(make_material(color=(0.7, 0.3, 0.2), roughness=0.4),
               pos=(0, 0.5, 0), extent=(0.5, 0.5, 0.5))
    hs.add_box(make_material(color=(0.3, 0.5, 0.8), metallic=1.0, roughness=0.2),
               pos=(0.9, 0.3, 0.2), extent=(0.3, 0.3, 0.3))
    v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 1, 0.5], [0.5, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3], [1, 3, 2], [0, 3, 1]], np.int32)
    hs.add_mesh(Mesh(vertices=v, indices=f, normals=None,
                     material=make_material(color=(0.2, 0.8, 0.3))))
    return hs, [[0, 1], [2]]


def _instances(n=40, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ang = rng.uniform(0, 2 * np.pi)
        sc = rng.uniform(0.6, 1.6)
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(4)
        m[:3, :3] = sc * np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        m[:3, 3] = (rng.uniform(-20, 20), 0.0, rng.uniform(-20, 20))
        out.append((i % 2, m))
    return out


def _baked(hs: HostScene, groups, instances) -> HostScene:
    out = HostScene()
    for p, xf in instances:
        a, b = xf[:3, :3], xf[:3, 3]
        for mi in groups[p]:
            m = hs.meshes[mi]
            out.add_mesh(Mesh(
                vertices=(m.vertices @ a.T + b).astype(np.float32),
                indices=m.indices.copy(),
                normals=None if m.normals is None else
                (m.normals @ np.linalg.inv(a)).astype(np.float32),
                texcoords=None if m.texcoords is None else m.texcoords.copy(),
                material=dict(m.material),
            ))
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
def test_tlas_traversal_matches_baked():
    hs, groups = _host_with_protos()
    insts = _instances(100)
    ct = compile_tlas(hs, groups, insts, cluster_size=64)
    cb = compile_scene(_baked(hs, groups, insts), cluster_size=64,
                       build_wide_bvh=False)
    # geometry stored once per PROTOTYPE, not per instance
    assert ct.clusters.rows.shape[0] < cb.clusters.rows.shape[0]
    assert ct.num_triangles == cb.num_triangles

    o, d = _rays()
    rt = closest_hit_cluster(ct.clusters, o, d, 1e-3, 1e16, interpret=True)
    rb = closest_hit_cluster(cb.clusters, o, d, 1e-3, 1e16, interpret=True)
    hit_t = np.asarray(rt.tri) >= 0
    hit_b = np.asarray(rb.tri) >= 0
    assert (hit_t == hit_b).all()
    np.testing.assert_allclose(
        np.asarray(rt.t)[hit_b], np.asarray(rb.t)[hit_b], rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_tlas_render_matches_baked():
    """Full engine render (shading resolves entry slots across prototype
    BLAS boundaries, per-prototype materials ride the shared SBT)."""
    hs, groups = _host_with_protos()
    insts = _instances(12, seed=3)
    ct = compile_tlas(hs, groups, insts, cluster_size=64)
    cb = compile_scene(_baked(hs, groups, insts), cluster_size=64,
                       build_wide_bvh=False)
    probe = build_probe(np.full((16, 32, 3), 0.6, np.float32))
    cfg = RenderConfig(width=64, height=48, samples_per_launch=2, max_depth=2,
                       traversal="cluster")
    cam = Camera(eye=(18, 12, 18), lookat=(0, 0, 0), up=(0, 1, 0), fov_y=50,
                 aspect_ratio=64 / 48)
    a = Renderer(ct, probe, cfg, cam)
    a.render()
    b = Renderer(cb, probe, cfg, cam)
    b.render()
    rmse = float(np.sqrt(np.mean((a.accum_image() - b.accum_image()) ** 2)))
    assert rmse < 2e-3, rmse


@pytest.mark.slow
def test_tlas_transform_update_no_rebuild():
    hs, groups = _host_with_protos()
    insts = _instances(10, seed=5)
    ct, tables = compile_tlas(hs, groups, insts, cluster_size=64,
                              return_tables=True)
    insts2 = _instances(10, seed=11)
    inst_proto = np.asarray([p for p, _ in insts2])
    xfs2 = np.stack([m for _, m in insts2])
    moved = update_tlas_transforms(ct.clusters, tables, inst_proto, xfs2)
    assert moved.rows is ct.clusters.rows  # BLAS pool untouched

    ct2 = compile_tlas(hs, groups, insts2, cluster_size=64)
    o, d = _rays(1024, seed=4)
    r1 = closest_hit_cluster(moved, o, d, 1e-3, 1e16, interpret=True)
    r2 = closest_hit_cluster(ct2.clusters, o, d, 1e-3, 1e16, interpret=True)
    assert (np.asarray(r1.tri) == np.asarray(r2.tri)).all()
