"""Native C++ acceleration-structure compiler (native/src/accel.cpp) vs the
numpy reference builders — equivalence and contract tests.

The native library fills the role of the reference's native accel build
(optixAccelBuild, SimplePathtracer.cpp:457-601) for the TPU framework's
host-side scene compile; the numpy builders define the semantics. Three
stages must be BIT-EXACT (binary LBVH, wide collapse, cluster tables); the
treelet order is contract-equivalent (numpy argpartition's intra-partition
order is unspecified, so only cluster tightness is comparable).
"""
from __future__ import annotations

import numpy as np
import pytest

from optixpathtracer_tpu.bvh import native
from optixpathtracer_tpu.bvh.clusters import (
    SUPER,
    _cluster_tables_np,
    treelet_order,
)
from optixpathtracer_tpu.bvh.lbvh import (
    _np_karras_tree,
    _np_levels,
    _np_refit,
)
from optixpathtracer_tpu.bvh.morton import np_morton_codes
from optixpathtracer_tpu.bvh.wide import collapse

if native.get_lib() is None:
    pytest.skip("native accel library unavailable", allow_module_level=True)


def _random_tris(n, seed, dupes=False):
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(-20, 20, (n, 3))
    if dupes:  # coincident centroids exercise the Morton/Karras tie-breaks
        k = max(1, n // 8)
        ctr[rng.integers(0, n, k)] = ctr[rng.integers(0, n, k)]
    e1 = rng.normal(0, 0.5, (n, 3))
    e2 = rng.normal(0, 0.5, (n, 3))
    v0 = (ctr - (e1 + e2) / 3).astype(np.float32)
    return v0, (v0 + e1).astype(np.float32), (v0 + e2).astype(np.float32)


def _np_binary(v0, v1, v2, leaf_size):
    """The numpy lbvh.build_bvh host stage, reproduced stage-by-stage."""
    t = v0.shape[0]
    pad_to = max(leaf_size, ((t + leaf_size - 1) // leaf_size) * leaf_size)
    c = (v0.astype(np.float64) + v1 + v2) / 3.0
    codes = np_morton_codes(c)
    order = np.argsort(codes, kind="stable")
    if pad_to > t:
        order = np.concatenate([order, np.repeat(order[-1:], pad_to - t)])
    sorted_codes = codes[order]
    num_leaves = pad_to // leaf_size
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    lf_min = tri_min[order].reshape(num_leaves, leaf_size, 3).min(axis=1)
    lf_max = tri_max[order].reshape(num_leaves, leaf_size, 3).max(axis=1)
    left, right = _np_karras_tree(sorted_codes[::leaf_size].copy())
    level, depth = _np_levels(left, right)
    lmin, lmax, rmin, rmax = _np_refit(
        left, right, lf_min.astype(np.float32), lf_max.astype(np.float32), level
    )
    return dict(order=order, left=left, right=right, lmin=lmin, lmax=lmax,
                rmin=rmin, rmax=rmax, depth=depth)


@pytest.mark.parametrize("n,seed,dupes", [
    (1, 0, False), (3, 1, False), (4, 2, False), (97, 3, False),
    (1000, 4, False), (1000, 5, True), (4096, 6, True),
])
def test_build_binary_bit_exact(n, seed, dupes):
    v0, v1, v2 = _random_tris(n, seed, dupes)
    ref = _np_binary(v0, v1, v2, leaf_size=4)
    nat = native.build_binary(v0, v1, v2, leaf_size=4)
    assert nat is not None
    np.testing.assert_array_equal(nat["order"], ref["order"])
    np.testing.assert_array_equal(nat["left"], ref["left"])
    np.testing.assert_array_equal(nat["right"], ref["right"])
    for k in ("lmin", "lmax", "rmin", "rmax"):
        np.testing.assert_array_equal(nat[k], ref[k])
    assert nat["depth"] == ref["depth"]


@pytest.mark.parametrize("n,seed,width", [
    (40, 0, 8), (1000, 1, 8), (1000, 2, 4), (4096, 3, 8), (8, 4, 8),
])
def test_wide_collapse_bit_exact(n, seed, width):
    v0, v1, v2 = _random_tris(n, seed, dupes=True)
    ref = _np_binary(v0, v1, v2, leaf_size=4)
    num_leaves = len(ref["left"]) + 1
    bbox_ref, refs_ref, depth_ref = collapse(
        ref["left"], ref["right"], ref["lmin"], ref["lmax"], ref["rmin"],
        ref["rmax"], num_leaves, width)
    nat = native.wide_collapse(
        ref["left"], ref["right"], ref["lmin"], ref["lmax"], ref["rmin"],
        ref["rmax"], num_leaves, width)
    assert nat is not None
    bbox_nat, refs_nat, depth_nat = nat
    assert depth_nat == depth_ref
    np.testing.assert_array_equal(refs_nat, refs_ref)
    np.testing.assert_array_equal(bbox_nat, bbox_ref)


def _cluster_radii(ctr, order, c):
    n = len(order) // c * c
    grouped = ctr[order[:n]].reshape(-1, c, 3)
    half = (grouped.max(axis=1) - grouped.min(axis=1)) / 2
    return np.sqrt((half * half).sum(axis=1))


@pytest.mark.parametrize("n,seed", [(1000, 0), (5000, 1), (130, 2)])
def test_treelet_order_contract(n, seed):
    """Native treelet order: a permutation whose aligned cluster runs are as
    tight as the numpy builder's (mean bounding radius within 10%)."""
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(-30, 30, (n, 3))
    ctr[: n // 4, 1] *= 0.01  # a flattened slab region like the city ground
    c = 64
    nat = native.treelet_order(ctr, c, SUPER)
    assert nat is not None
    assert sorted(nat.tolist()) == list(range(n))  # a true permutation
    import os

    os.environ["OPTIX_TPU_NO_NATIVE"] = "1"
    try:
        ref = treelet_order(ctr, c)
    finally:
        del os.environ["OPTIX_TPU_NO_NATIVE"]
    r_nat = _cluster_radii(ctr, nat, c).mean()
    r_ref = _cluster_radii(ctr, ref, c).mean()
    assert r_nat <= r_ref * 1.10, (r_nat, r_ref)


@pytest.mark.parametrize("n,seed,c", [(1, 0, 128), (130, 1, 64), (1000, 2, 128),
                                      (1100, 3, 128)])
def test_cluster_tables_bit_exact(n, seed, c):
    v0, v1, v2 = _random_tris(n, seed)
    ref = _cluster_tables_np(v0, v1, v2, n, c)
    nat = native.cluster_tables(v0, v1, v2, n, c)
    assert nat is not None
    for k in ("rows", "spheres", "super_spheres", "scene_aabb", "local_aabb"):
        np.testing.assert_array_equal(np.asarray(nat[k]), np.asarray(ref[k]),
                                      err_msg=k)


def test_cluster_tables_num_real_below_input():
    """num_real < len(input): the tail must become degenerate padding."""
    v0, v1, v2 = _random_tris(300, 7)
    ref = _cluster_tables_np(v0, v1, v2, 257, 64)
    nat = native.cluster_tables(v0, v1, v2, 257, 64)
    for k in ("rows", "spheres", "super_spheres", "scene_aabb"):
        np.testing.assert_array_equal(np.asarray(nat[k]), np.asarray(ref[k]),
                                      err_msg=k)


def test_end_to_end_compile_scene_native_matches_numpy():
    """compile_scene with the native builder produces identical traversal
    results (closest-hit tri/t) to the pure-numpy build on random rays."""
    import os

    import jax.numpy as jnp

    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.math import Vec3
    from optixpathtracer_tpu.core.scene import HostScene
    from optixpathtracer_tpu.ops.traverse import closest_hit

    from optixpathtracer_tpu.core.materials import make_material

    def build_host():
        hs = HostScene()
        rng = np.random.default_rng(11)
        for i in range(12):
            p = rng.uniform(-4, 4, 3)
            hs.add_box(make_material(color=(0.7, 0.7, 0.7)), p,
                       (0.8, 1.2, 0.6))
        return hs

    cs_nat = compile_scene(build_host(), build_cluster_set=True)
    os.environ["OPTIX_TPU_NO_NATIVE"] = "1"
    try:
        cs_np = compile_scene(build_host(), build_cluster_set=True)
    finally:
        del os.environ["OPTIX_TPU_NO_NATIVE"]

    rng = np.random.default_rng(12)
    o = rng.uniform(-6, 6, (256, 3)).astype(np.float32)
    d = rng.normal(0, 1, (256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    def trace(cs):
        hit = closest_hit(
            cs.bvh, cs.scene,
            Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
            Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
        )
        return np.asarray(hit.tri), np.asarray(hit.t)

    tri_a, t_a = trace(cs_nat)
    tri_b, t_b = trace(cs_np)
    np.testing.assert_array_equal(tri_a, tri_b)
    np.testing.assert_array_equal(t_a, t_b)
