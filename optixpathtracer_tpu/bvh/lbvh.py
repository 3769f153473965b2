"""LBVH builder: Morton sort -> Karras binary tree -> level-ordered refit.

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

The builder is pure numpy host code: a scene build is a one-time O(T log T)
array pipeline for which vectorized numpy is both faster and safer than
eager jax dispatch (round 1 measured minutes of eager-dispatch overhead when
ops leaked to the tunneled TPU backend). Only the final upload touches jax.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import Vec3
from .morton import np_clz32, np_morton_codes

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


TRAVERSAL_STACK_DEPTH = 64  # per-ray stack slots in ops/traverse.py


def _np_delta(codes: np.ndarray, i: np.ndarray, j: np.ndarray, n: int) -> np.ndarray:
    """Common-prefix length between sorted keys i and j; -1 when j is out of
    range. Equal Morton codes fall back to index bits (standard Karras
    tie-break), which also guarantees bounded tree depth."""
    valid = (j >= 0) & (j < n)
    jc = np.clip(j, 0, n - 1)
    x = codes[i] ^ codes[jc]
    tie = 32 + np_clz32((i ^ jc).astype(np.uint32))
    base = np.where(x == 0, tie, np_clz32(x))
    return np.where(valid, base, -1).astype(np.int64)


def _np_karras_tree(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Emit internal-node children for sorted 30-bit codes (numpy,
    vectorized over all nodes). Returns (left, right) int32 with leaves
    encoded as -(leaf_id+1). Karras 2012, same masked fixed-trip searches as
    a GPU emission but over numpy lanes."""
    n = len(codes)
    if n == 1:
        return np.full(1, -1, np.int32), np.full(1, -1, np.int32)

    i = np.arange(n - 1, dtype=np.int64)
    d = np.sign(
        _np_delta(codes, i, i + 1, n) - _np_delta(codes, i, i - 1, n)
    ).astype(np.int64)
    d[d == 0] = 1
    delta_min = _np_delta(codes, i, i - d, n)

    # exponential upper bound for the range length
    l_max = np.full_like(i, 2)
    done = np.zeros(n - 1, bool)
    for _ in range(64):
        if done.all():
            break
        ok = _np_delta(codes, i, i + l_max * d, n) > delta_min
        l_max = np.where(ok & ~done, l_max * 2, l_max)
        done |= ~ok

    # binary search the exact other end j = i + l*d
    l = np.zeros_like(i)
    for k in range(1, 64):
        t = l_max >> k
        if not (t >= 1).any():
            break
        ok = (t >= 1) & (_np_delta(codes, i, i + (l + t) * d, n) > delta_min)
        l = np.where(ok, l + t, l)
    j = i + l * d
    delta_node = _np_delta(codes, i, j, n)

    # binary search the split point
    s = np.zeros_like(i)
    prev = l.copy()
    for k in range(64):
        t = (prev + 1) >> 1
        active = (prev > 1) | (k == 0)
        ok = active & (_np_delta(codes, i, i + (s + t) * d, n) > delta_node)
        s = np.where(ok, s + t, s)
        if not (prev > 1).any():
            break
        prev = t

    gamma = i + s * d + np.minimum(d, 0)
    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    left = np.where(lo == gamma, -(gamma + 1), gamma)
    right = np.where(hi == gamma + 1, -(gamma + 2), gamma + 1)
    return left.astype(np.int32), right.astype(np.int32)


def _np_levels(left: np.ndarray, right: np.ndarray) -> tuple[np.ndarray, int]:
    """Per-internal-node depth from the root + total tree depth (levels),
    via a vectorized breadth-first frontier walk."""
    m = len(left)
    level = np.full(m, -1, np.int32)
    level[0] = 0
    frontier = np.array([0], np.int64)
    depth = 0
    while len(frontier):
        kids = np.concatenate([left[frontier], right[frontier]])
        kids = kids[kids >= 0]
        if len(kids) == 0:
            break
        depth += 1
        level[kids] = depth
        frontier = kids
    return level, depth + 1  # +1: the leaf level below the last internal


def _np_refit(
    left: np.ndarray,
    right: np.ndarray,
    leaf_min: np.ndarray,
    leaf_max: np.ndarray,
    level: np.ndarray,
) -> tuple[np.ndarray, ...]:
    """Exact bottom-up AABB refit, one vectorized pass per tree level.

    Returns per-parent child boxes (lmin, lmax, rmin, rmax), each (M, 3) —
    child boxes live at the parent so a traversal step is ONE node fetch.
    """
    m = len(left)
    node_min = np.full((m, 3), np.inf, np.float32)
    node_max = np.full((m, 3), -np.inf, np.float32)
    single_leaf = len(leaf_min) == 1

    def child_box(ch):
        isleaf = ch < 0
        leaf_id = np.clip(-(ch + 1), 0, len(leaf_min) - 1)
        node_id = np.clip(ch, 0, m - 1)
        cmin = np.where(isleaf[:, None], leaf_min[leaf_id], node_min[node_id])
        cmax = np.where(isleaf[:, None], leaf_max[leaf_id], node_max[node_id])
        return cmin, cmax

    for lev in range(int(level.max()), -1, -1):
        sel = np.nonzero(level == lev)[0]
        lmin_s, lmax_s = child_box(left[sel])
        rmin_s, rmax_s = child_box(right[sel])
        node_min[sel] = np.minimum(lmin_s, rmin_s)
        node_max[sel] = np.maximum(lmax_s, rmax_s)

    lmin, lmax = child_box(left)
    rmin, rmax = child_box(right)
    if single_leaf:
        # degenerate tree: kill the duplicate right child with an empty box
        rmin = np.full((m, 3), np.inf, np.float32)
        rmax = np.full((m, 3), -np.inf, np.float32)
    return lmin, lmax, rmin, rmax


class BuildResult(NamedTuple):
    bvh: BVH
    order: np.ndarray  # host-side permutation: sorted position -> original tri
    padded_count: int
    depth: int = 0  # binary tree depth in levels (incl. leaf level)
    # host copies of the tree arrays: downstream host-side builders (wide
    # BVH collapse) must NEVER round-trip device arrays back to numpy — a
    # device->host download through the TPU tunnel costs ~35s PER ARRAY
    host: dict | None = None


def build_bvh(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    leaf_size: int = 4,
    sweeps: int | None = None,  # deprecated, ignored (refit is exact now)
    build_device: str | None = "cpu",  # deprecated, ignored (pure numpy)
) -> BuildResult:
    """Build from host (T,3) triangle vertex arrays, entirely in numpy.

    Runs host-side in vectorized numpy (morton + argsort + Karras emission +
    level-ordered refit are all array ops): ~150k triangles build in well
    under a second, and no eager op can accidentally dispatch through a
    remote accelerator backend (which is what made round-1 builds take
    minutes). Only the final device upload touches jax.
    """
    del sweeps, build_device
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = v0.shape[0]
    pad_to = max(leaf_size, ((t + leaf_size - 1) // leaf_size) * leaf_size)

    # native C++ fast path (bit-exact vs the numpy pipeline below; see
    # native/src/accel.cpp + tests/test_accel_native.py), numpy fallback
    from . import native as _native

    nat = _native.build_binary(v0, v1, v2, leaf_size)
    if nat is not None:
        order = nat["order"]
        left, right = nat["left"], nat["right"]
        lmin, lmax, rmin, rmax = nat["lmin"], nat["lmax"], nat["rmin"], nat["rmax"]
        depth = nat["depth"]  # same convention as _np_levels (incl. leaf level)
    else:
        c = (v0.astype(np.float64) + v1 + v2) / 3.0
        codes = np_morton_codes(c)
        order = np.argsort(codes, kind="stable")
        # pad by repeating the last sorted triangle: duplicate hits are
        # harmless and keep the tail leaf's bounding box tight (no fake
        # far-away geometry)
        if pad_to > t:
            order = np.concatenate([order, np.repeat(order[-1:], pad_to - t)])

        sorted_codes = codes[order]
        num_leaves = pad_to // leaf_size

        tri_min = np.minimum(np.minimum(v0, v1), v2)
        tri_max = np.maximum(np.maximum(v0, v1), v2)
        lf_min = tri_min[order].reshape(num_leaves, leaf_size, 3).min(axis=1)
        lf_max = tri_max[order].reshape(num_leaves, leaf_size, 3).max(axis=1)

        leaf_codes = sorted_codes[::leaf_size].copy()
        left, right = _np_karras_tree(leaf_codes)
        level, depth = _np_levels(left, right)
        lmin, lmax, rmin, rmax = _np_refit(
            left, right, lf_min.astype(np.float32), lf_max.astype(np.float32),
            level,
        )
    if depth + 1 > TRAVERSAL_STACK_DEPTH:
        raise ValueError(
            f"BVH depth {depth + 1} exceeds the lockstep traversal stack "
            f"({TRAVERSAL_STACK_DEPTH}); raise leaf_size or STACK_DEPTH "
            "(degenerate Morton distribution?)"
        )

    def vec(a: np.ndarray) -> Vec3:
        return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))

    bvh = BVH(
        child_left=jnp.asarray(left),
        child_right=jnp.asarray(right),
        left_min=vec(lmin),
        left_max=vec(lmax),
        right_min=vec(rmin),
        right_max=vec(rmax),
        leaf_size=leaf_size,
    )
    host = dict(left=left, right=right, lmin=lmin, lmax=lmax, rmin=rmin, rmax=rmax)
    return BuildResult(bvh=bvh, order=order, padded_count=pad_to, depth=depth, host=host)
