"""Hierarchical (3-level node) cluster traversal — exactness vs the dense
oracle (VERDICT r4 item 1: the triangle-count scaling axis).

The hier path must be bit-identical in hit ids to reference_closest on every
geometry it can see, including entry counts not divisible by NODE (sentinel
padding) and TLAS scenes whose nodes straddle instance boundaries.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from optixpathtracer_tpu.builder import compile_scene, compile_tlas
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.core.materials import make_material
from optixpathtracer_tpu.core.scene import HostScene, Mesh
from optixpathtracer_tpu.ops.traverse_cluster import (
    NODE,
    any_hit_cluster,
    any_hit_cluster_hier,
    block_cull_nodes,
    closest_hit_cluster,
    closest_hit_cluster_hier,
    _node_tables,
    reference_closest,
)


def _soup_scene(n_tris=1800, seed=0, cluster_size=8):
    """Random-ish quads scattered in a box => many entries at tiny C."""
    rng = np.random.default_rng(seed)
    hs = HostScene()
    c = rng.uniform(-10, 10, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.8, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.8, (n_tris, 3)).astype(np.float32)
    v = np.stack([c, c + e1, c + e2], axis=1).reshape(-1, 3)
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    hs.add_mesh(Mesh(vertices=v, indices=idx,
                     material=make_material(color=(0.5, 0.5, 0.5))))
    return compile_scene(hs, leaf_size=4, build_wide_bvh=False,
                         cluster_size=cluster_size)


def _rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*(jnp.asarray(o[:, i]) for i in range(3))),
            Vec3(*(jnp.asarray(d[:, i]) for i in range(3))))


def test_node_tables_padding():
    cs = _soup_scene(n_tris=1800, cluster_size=8)  # 1800/64 -> 29 entries
    cl = cs.clusters
    assert cl.num_entries % NODE != 0  # exercises sentinel padding
    node_sph_t, csph, erow2, exf2 = _node_tables(
        cl.super_spheres, cl.spheres, cl.entry_row, cl.entry_xf)
    e8 = erow2.shape[1]
    assert e8 % NODE == 0 and e8 >= cl.num_entries
    assert csph.shape == (e8 // NODE, 8, NODE * 8)
    # sentinel entries sit at a far center with zero radius
    n2 = e8 // NODE
    pad_col = cl.num_entries  # first padded entry, member-major column
    k2 = pad_col % NODE if False else None  # layout doc below
    # member-major: entry k2 of node j at column k2*n2 + j
    j = cl.num_entries // NODE
    k2 = cl.num_entries % NODE
    col = k2 * n2 + j
    assert float(node_sph_t[0, col]) > 1e30  # cx = _BIG/2
    assert float(node_sph_t[3, col]) == 0.0  # r = 0


def test_hier_closest_matches_oracle():
    cs = _soup_scene()
    o, d = _rays()
    ref = reference_closest(cs.clusters, o, d, 1e-3, 1e16)
    got = closest_hit_cluster_hier(cs.clusters, o, d, 1e-3, 1e16)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)
    hit = np.asarray(ref.tri) >= 0
    assert hit.sum() > 50  # the comparison actually exercised hits
    np.testing.assert_allclose(np.asarray(got.u)[hit],
                               np.asarray(ref.u)[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v)[hit],
                               np.asarray(ref.v)[hit], atol=1e-5)


def test_hier_matches_flat_backend():
    cs = _soup_scene(seed=3)
    o, d = _rays(seed=4)
    flat = closest_hit_cluster(cs.clusters, o, d, 1e-3, 1e16, hier=False)
    hier = closest_hit_cluster(cs.clusters, o, d, 1e-3, 1e16, hier=True)
    np.testing.assert_array_equal(np.asarray(hier.tri), np.asarray(flat.tri))
    np.testing.assert_allclose(np.asarray(hier.t), np.asarray(flat.t),
                               rtol=1e-6)


def test_hier_any_hit_matches_oracle():
    cs = _soup_scene(seed=5)
    o, d = _rays(seed=6)
    t_max = 14.0
    ref = reference_closest(cs.clusters, o, d, 1e-2, t_max)
    want = np.asarray(ref.tri) >= 0
    occ, ovf = any_hit_cluster_hier(cs.clusters, o, d, 1e-2, t_max)
    np.testing.assert_array_equal(np.asarray(occ), want)
    assert float(ovf) == 0.0


def test_hier_groups_variants():
    # same geometry/ray SHAPES as the oracle test above: the jitted hier
    # kernels (and the persistent XLA cache) are reused, only groups=2
    # compiles fresh — interpret-mode compiles dominate this file's runtime
    cs = _soup_scene(seed=7)
    o, d = _rays(seed=8)
    ref = reference_closest(cs.clusters, o, d, 1e-3, 1e16)
    for groups in (1, 2):
        got = closest_hit_cluster_hier(cs.clusters, o, d, 1e-3, 1e16,
                                       groups=groups)
        np.testing.assert_array_equal(np.asarray(got.tri),
                                      np.asarray(ref.tri))


def test_hier_tlas_instances():
    """Nodes straddle instance boundaries: per-entry transforms must be
    re-read inside a node."""
    hs = HostScene()
    rng = np.random.default_rng(9)
    for color in ((0.8, 0.2, 0.2), (0.2, 0.8, 0.2)):
        c = rng.uniform(-2, 2, (192, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.9, (192, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.9, (192, 3)).astype(np.float32)
        v = np.stack([c, c + e1, c + e2], axis=1).reshape(-1, 3)
        idx = np.arange(3 * 192, dtype=np.int32).reshape(-1, 3)
        hs.add_mesh(Mesh(vertices=v, indices=idx,
                         material=make_material(color=color)))
    insts = []
    for i in range(5):
        m = np.eye(4)
        th = 0.7 * i
        m[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]]) * (0.8 + 0.2 * i)
        m[:3, 3] = (3.0 * i - 6.0, 0.5 * i, 1.5 * i - 3.0)
        insts.append((i % 2, m))
    cs = compile_tlas(hs, groups=[[0], [1]], instances=insts, cluster_size=8)
    cl = cs.clusters
    assert cl.num_entries > NODE  # multiple nodes
    o, d = _rays(n=384, seed=10)
    ref = reference_closest(cl, o, d, 1e-3, 1e16)
    got = closest_hit_cluster_hier(cl, o, d, 1e-3, 1e16)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6)
    assert (np.asarray(ref.tri) >= 0).sum() > 15


def test_auto_threshold_routing():
    """hier=None routes by entry count without changing results (small
    scenes stay on the flat path; shapes shared with the tests above)."""
    cs = _soup_scene(seed=11)
    o, d = _rays(seed=12)
    auto = closest_hit_cluster(cs.clusters, o, d, 1e-3, 1e16)
    ref = reference_closest(cs.clusters, o, d, 1e-3, 1e16)
    np.testing.assert_array_equal(np.asarray(auto.tri), np.asarray(ref.tri))


def test_node_cull_conservative():
    """Every entry whose supercluster some ray can reach must appear in a
    surviving node (the cull may only ever over-include)."""
    cs = _soup_scene(seed=13, n_tris=700)
    cl = cs.clusters
    o, d = _rays(n=128, seed=14)
    node_sph_t, csph, erow2, exf2 = _node_tables(
        cl.super_spheres, cl.spheres, cl.entry_row, cl.entry_xf)
    cull = block_cull_nodes(cl, node_sph_t, o, d, 1e-3, 1e16, block=128,
                            pallas_cull=False)
    ref = reference_closest(cl, o, d, 1e-3, 1e16)
    tri = np.asarray(ref.tri)
    slot_tri = tri.copy()
    if cl.tri_map is not None:
        # invert tri_map: scene tri id -> slot id
        tm = np.asarray(cl.tri_map)
        inv = np.full(tm.max() + 2, -1, np.int64)
        inv[tm] = np.arange(len(tm))
        slot_tri = np.where(tri >= 0, inv[np.maximum(tri, 0)], -1)
    ids = np.asarray(cull.ids)
    count = np.asarray(cull.count)[:, 0]
    slots_per_entry = 8 * cl.cluster_size
    for i in range(len(tri)):
        if tri[i] < 0:
            continue
        blk = i // 128
        eid = slot_tri[i] // slots_per_entry
        nid = eid // NODE
        assert nid in set(ids[blk, : count[blk]].tolist()), (
            f"ray {i}: hit node {nid} culled")
