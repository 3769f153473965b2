"""On-device LBVH builder: Morton sort -> Karras binary tree -> AABB refit.

TPU-native replacement for the reference's hardware acceleration-structure
build (optixAccelBuild + compaction, SimplePathtracer.cpp:457-601 and
sutil/Scene.cpp:776-1069). Design differences from the GPU original, chosen
for XLA/TPU:

* Contiguous leaves: triangles are sorted by Morton code and grouped into
  fixed-size leaves of K consecutive triangles. A leaf fetch during traversal
  is therefore a contiguous K-triangle slice (dense vector loads), not an
  arbitrary gather.
* Karras 2012 internal-node emission, vectorized over all nodes at once with
  masked fixed-trip binary searches (no data-dependent Python control flow;
  everything jit-compiles to static loops).
* Refit by fixed-point sweeps: each sweep pulls child AABBs up one level;
  tree depth is bounded by the 30 Morton bits + log2(#leaves) index
  tie-break, so a static sweep count converges. No atomics needed.
* Child AABBs are stored at the parent (left/right box pairs), so a traversal
  step is ONE node gather that tests both children.

The builder is pure jnp — it runs on the TPU itself (argsort is XLA's on
device sort), so scene updates never round-trip through the host.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import Vec3
from .morton import clz32, morton_codes

Array = jax.Array
_I32 = jnp.int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH:
    """Flattened 2-wide BVH over fixed-size triangle leaves.

    M = num_leaves - 1 internal nodes (min 1). Children encode leaves as
    negative: child = -(leaf_id + 1); non-negative child = internal node id.
    Leaf `i` owns triangles [i*K, (i+1)*K) of the sorted triangle arrays.
    `leaf_size` is static pytree metadata (it shapes the traversal kernel).
    """

    child_left: Array  # (M,) int32
    child_right: Array  # (M,) int32
    left_min: Vec3  # (M,)
    left_max: Vec3
    right_min: Vec3
    right_max: Vec3
    leaf_size: int = dataclasses.field(metadata=dict(static=True))  # static K

    @property
    def num_internal(self) -> int:
        return self.child_left.shape[0]

    @property
    def num_leaves(self) -> int:
        return self.num_internal + 1


def _delta(codes: Array, i: Array, j: Array, n: int) -> Array:
    """Common-prefix length between keys i and j; -1 when j out of range.

    Equal Morton codes fall back to index bits (standard Karras tie-break),
    which also guarantees bounded tree depth.
    """
    valid = (j >= 0) & (j < n)
    jc = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[jc]
    x = ci ^ cj
    base = jnp.where(x == 0, 32 + clz32((i.astype(jnp.uint32) ^ jc.astype(jnp.uint32))), clz32(x))
    return jnp.where(valid, base, -1).astype(_I32)


def _karras_tree(codes: Array) -> tuple[Array, Array]:
    """Emit internal-node children for sorted 30-bit codes. Returns (left, right)
    with leaves encoded as -(leaf_id+1)."""
    n = codes.shape[0]  # num leaves
    if n == 1:
        # single leaf: root points at it twice; right child gets an empty box
        left = jnp.full((1,), -1, _I32)
        right = jnp.full((1,), -1, _I32)
        return left, right

    i = jnp.arange(n - 1, dtype=_I32)
    d = jnp.sign(_delta(codes, i, i + 1, n) - _delta(codes, i, i - 1, n)).astype(_I32)
    d = jnp.where(d == 0, 1, d)
    delta_min = _delta(codes, i, i - d, n)

    # exponential upper bound for the range length
    l_max = jnp.full_like(i, 2)
    done = jnp.zeros_like(i, dtype=bool)
    for _ in range(32):
        ok = _delta(codes, i, i + l_max * d, n) > delta_min
        grow = ok & ~done
        done = done | ~ok
        l_max = jnp.where(grow, l_max * 2, l_max)

    # binary search the exact other end j = i + l*d
    l = jnp.zeros_like(i)
    for k in range(1, 32):
        t = l_max >> k
        ok = (t >= 1) & (_delta(codes, i, i + (l + t) * d, n) > delta_min)
        l = jnp.where(ok, l + t, l)
    j = i + l * d
    delta_node = _delta(codes, i, j, n)

    # binary search the split point
    s = jnp.zeros_like(i)
    prev = l
    for k in range(32):
        t = (prev + 1) >> 1
        active = (prev > 1) | (k == 0)
        ok = active & (_delta(codes, i, i + (s + t) * d, n) > delta_node)
        s = jnp.where(ok, s + t, s)
        prev = t

    gamma = i + s * d + jnp.minimum(d, 0)
    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    left = jnp.where(lo == gamma, -(gamma + 1), gamma)
    right = jnp.where(hi == gamma + 1, -(gamma + 2), gamma + 1)
    return left.astype(_I32), right.astype(_I32)


def _refit(
    left: Array,
    right: Array,
    leaf_min: Vec3,
    leaf_max: Vec3,
    sweeps: int,
) -> tuple[Vec3, Vec3, Vec3, Vec3]:
    """Pull leaf AABBs up the tree; returns per-parent child boxes."""
    m = left.shape[0]
    single_leaf = leaf_min.x.shape[0] == 1

    node_min = Vec3.full((m,), jnp.inf)
    node_max = Vec3.full((m,), -jnp.inf)

    def child_box(child, nmin, nmax):
        is_leaf = child < 0
        leaf_id = jnp.clip(-(child + 1), 0, leaf_min.x.shape[0] - 1)
        node_id = jnp.clip(child, 0, m - 1)
        cmin = Vec3(
            jnp.where(is_leaf, leaf_min.x[leaf_id], nmin.x[node_id]),
            jnp.where(is_leaf, leaf_min.y[leaf_id], nmin.y[node_id]),
            jnp.where(is_leaf, leaf_min.z[leaf_id], nmin.z[node_id]),
        )
        cmax = Vec3(
            jnp.where(is_leaf, leaf_max.x[leaf_id], nmax.x[node_id]),
            jnp.where(is_leaf, leaf_max.y[leaf_id], nmax.y[node_id]),
            jnp.where(is_leaf, leaf_max.z[leaf_id], nmax.z[node_id]),
        )
        return cmin, cmax

    def body(_, carry):
        nmin, nmax = carry
        lmin, lmax = child_box(left, nmin, nmax)
        rmin, rmax = child_box(right, nmin, nmax)
        new_min = Vec3(
            jnp.minimum(lmin.x, rmin.x), jnp.minimum(lmin.y, rmin.y), jnp.minimum(lmin.z, rmin.z)
        )
        new_max = Vec3(
            jnp.maximum(lmax.x, rmax.x), jnp.maximum(lmax.y, rmax.y), jnp.maximum(lmax.z, rmax.z)
        )
        return new_min, new_max

    node_min, node_max = jax.lax.fori_loop(0, sweeps, body, (node_min, node_max))

    lmin, lmax = child_box(left, node_min, node_max)
    rmin, rmax = child_box(right, node_min, node_max)
    if single_leaf:
        # degenerate tree: kill the duplicate right child with an empty box
        rmin = Vec3.full((m,), jnp.inf)
        rmax = Vec3.full((m,), -jnp.inf)
    return lmin, lmax, rmin, rmax


class BuildResult(NamedTuple):
    bvh: BVH
    order: np.ndarray  # host-side permutation: sorted position -> original tri
    padded_count: int


def build_bvh(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    leaf_size: int = 4,
    sweeps: int | None = None,
    build_device: str | None = "cpu",
) -> BuildResult:
    """Build from host (T,3) triangle vertex arrays.

    The builder is pure jnp so it can run on any backend. By default it is
    pinned to the CPU backend (`build_device="cpu"`): the build is a one-time
    eager sequence of small ops, and on the tunneled TPU each eager dispatch
    costs ~5-10ms (memory/tpu-perf-facts) — hundreds of dispatches made scene
    builds take minutes. Pass build_device=None to run on the default device
    (e.g., for on-device rebuilds of dynamic geometry inside one jit).
    """
    if build_device is not None:
        try:
            dev = jax.devices(build_device)[0]
        except RuntimeError:
            dev = None
        if dev is not None:
            with jax.default_device(dev):
                return _build_bvh_impl(v0, v1, v2, leaf_size, sweeps)
    return _build_bvh_impl(v0, v1, v2, leaf_size, sweeps)


def _build_bvh_impl(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    leaf_size: int,
    sweeps: int | None,
) -> BuildResult:
    t = v0.shape[0]
    pad_to = max(leaf_size, ((t + leaf_size - 1) // leaf_size) * leaf_size)

    # centroids + morton on device
    c = (v0 + v1 + v2) / 3.0
    cx = jnp.asarray(c[:, 0])
    cy = jnp.asarray(c[:, 1])
    cz = jnp.asarray(c[:, 2])
    codes = morton_codes(cx, cy, cz)
    order_dev = jnp.argsort(codes)
    order = np.asarray(order_dev)
    # pad by repeating the last sorted triangle: duplicate hits are harmless
    # and keep the tail leaf's bounding box tight (no fake far-away geometry)
    if pad_to > t:
        order = np.concatenate([order, np.repeat(order[-1:], pad_to - t)])

    sorted_codes = jnp.asarray(np.asarray(codes)[order])
    num_leaves = pad_to // leaf_size

    # leaf AABBs from sorted + padded triangles
    def leaf_reduce(a: np.ndarray, op):
        s = a[order].reshape(num_leaves, leaf_size, 3)
        return op(s, axis=1)

    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    lf_min = leaf_reduce(tri_min, np.min)
    lf_max = leaf_reduce(tri_max, np.max)
    leaf_min = Vec3(jnp.asarray(lf_min[:, 0]), jnp.asarray(lf_min[:, 1]), jnp.asarray(lf_min[:, 2]))
    leaf_max = Vec3(jnp.asarray(lf_max[:, 0]), jnp.asarray(lf_max[:, 1]), jnp.asarray(lf_max[:, 2]))

    leaf_codes = sorted_codes[:: leaf_size]
    left, right = _karras_tree(leaf_codes)

    if sweeps is None:
        # depth bound: 30 morton bits + index tie-break bits, capped sensibly
        sweeps = min(num_leaves, 32 + int(math.ceil(math.log2(max(num_leaves, 2)))))

    lmin, lmax, rmin, rmax = _refit(left, right, leaf_min, leaf_max, sweeps)

    bvh = BVH(
        child_left=left,
        child_right=right,
        left_min=lmin,
        left_max=lmax,
        right_min=rmin,
        right_max=rmax,
        leaf_size=leaf_size,
    )
    return BuildResult(bvh=bvh, order=order, padded_count=pad_to)
