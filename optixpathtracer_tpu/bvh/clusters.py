"""Triangle clusters — the acceleration structure for the cluster traversal
backend (ops/traverse_cluster.py).

Replaces the role of the reference's hardware BVH (optixAccelBuild,
HelloPathtracing_original/SimplePathtracer.cpp:457-601) with a structure
designed for the TPU's strengths instead of pointer-chasing. Two fixed
granularities over the Morton-sorted triangle order:

* CLUSTER (C consecutive triangles): the compute granule. Triangles are
  stored pre-differenced as (9, C) float32 rows [v0 | e1 | e2] so a Pallas
  kernel can broadcast (B,1) ray components against (1,C) triangle rows and
  evaluate Moller-Trumbore for all B x C pairs as pure (B,C) VPU vector ops
  — full float32 exactness, no gathers. Each cluster carries a bounding
  sphere used by the kernel's per-ray re-test against the EVOLVING best-t
  (the dominant pruning mechanism).
* SUPERCLUSTER (SUPER consecutive clusters): the DMA + scheduling granule.
  One DMA moves a whole super's (9, SUPER*C) rows; the per-frame cull and
  near-to-far sort operate on supers, shrinking the per-sweep sort by SUPER x.

Exactness: a (super)cluster either is visited (every triangle tested
exactly) or is provably unreachable; there is NO truncation/overflow
failure mode (unlike traverse_bfs).

Design history (measured on v5e, see PERF_NOTES.md): an MXU bilinear
formulation (f_ray @ G = [det, u*det, v*det, t*det]) loses to straight VPU
evaluation at the f32-exact precision this needs (bf16_6x matmul ~1us vs
~0.2us per 128x128 visit); flat single-level clusters made the per-frame
sort (~25ms at M=1172) and unskippable per-visit compute the bottleneck.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NUM_ROWS = 9  # [v0x v0y v0z e1x e1y e1z e2x e2y e2z]
STORE_ROWS = 16  # storage rows: padded to the (8,128) sublane tiling so a
#                  (1, STORE_ROWS, SUPER*C) DMA slice is tile-aligned
SUPER = 8  # clusters per supercluster


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Device-resident two-level cluster acceleration structure."""

    rows: Array  # (S, 16, SUPER*C) f32 triangle rows [v0 | e1 | e2 | pad], grouped
    #              by supercluster; columns [cluster0 tris | cluster1 tris ...]
    spheres: Array  # (S*SUPER, 8) f32 per-cluster [cx cy cz r hx hy hz 0]
    super_spheres: Array  # (S, 8) f32 per-super bounding spheres
    scene_aabb: Array  # (8,) f32 [lox loy loz hix hiy hiz 0 0]: whole-scene
    #   box; rays' reach is capped at its exit (no hit can lie beyond), which
    #   is what makes the sweep's early exit effective for sky rays
    cluster_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_supers(self) -> int:
        return self.rows.shape[0]

    @property
    def num_clusters(self) -> int:
        return self.spheres.shape[0]

    @property
    def num_slots(self) -> int:
        """Total triangle slots (num_clusters * cluster_size)."""
        return self.num_clusters * self.cluster_size


def _bounds(v0, v1, v2, real_mask):
    """Per-group AABB center/half/radius over real triangles only.

    v*: (G, K, 3); real_mask: (G, K). Returns (center, half, radius)."""
    g = v0.shape[0]
    allv = np.concatenate([v0, v1, v2], axis=1)  # (G, 3K, 3)
    vm = np.concatenate([real_mask] * 3, axis=1)
    big = 3.0e37
    lo = np.where(vm[:, :, None], allv, big).min(axis=1)
    hi = np.where(vm[:, :, None], allv, -big).max(axis=1)
    anyreal = real_mask.any(axis=1)
    lo = np.where(anyreal[:, None], lo, 0.0)
    hi = np.where(anyreal[:, None], hi, 0.0)
    center = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    radius = np.sqrt((half * half).sum(axis=1))
    # dilate so float32 rounding of centers/radii stays conservative;
    # empty groups get r = 0 at the origin (never tested anyway)
    radius = np.where(anyreal, radius * (1.0 + 1e-5) + 1e-30, 0.0)
    return center, half, radius


def build_clusters(
    sorted_v0: np.ndarray,
    sorted_v1: np.ndarray,
    sorted_v2: np.ndarray,
    num_real: int,
    cluster_size: int = 128,
) -> ClusterSet:
    """Build the ClusterSet from spatially-sorted triangles.

    sorted_v*: (T, 3) float arrays in Morton/BVH order (consecutive runs are
    spatially tight, which is what makes fixed-size clusters usable as
    bounding volumes). Triangles at index >= num_real are padding and are
    replaced by degenerate never-hit triangles (zero normal => det == 0).
    """
    c = int(cluster_size)
    v0 = np.asarray(sorted_v0, np.float64)
    v1 = np.asarray(sorted_v1, np.float64)
    v2 = np.asarray(sorted_v2, np.float64)
    t_real = int(num_real)
    m = max(1, -(-t_real // c))
    s = -(-m // SUPER)
    m_pad = s * SUPER
    t_pad = m_pad * c

    def pad(v):
        out = np.zeros((t_pad, 3), np.float64)
        n = min(t_real, len(v))
        out[:n] = v[:n]
        return out

    v0, v1, v2 = pad(v0), pad(v1), pad(v2)
    if t_pad > t_real:  # degenerate padding triangles
        v0[t_real:] = 0.0
        v1[t_real:] = 0.0
        v2[t_real:] = 0.0

    cv0 = v0.reshape(m_pad, c, 3)
    cv1 = v1.reshape(m_pad, c, 3)
    cv2 = v2.reshape(m_pad, c, 3)
    real_mask = np.arange(t_pad).reshape(m_pad, c) < t_real  # (M, C)

    ctr, half, rad = _bounds(cv0, cv1, cv2, real_mask)
    spheres = np.zeros((m_pad, 8), np.float32)
    spheres[:, 0:3] = ctr
    spheres[:, 3] = rad
    spheres[:, 4:7] = half * (1.0 + 1e-5)

    sctr, shalf, srad = _bounds(
        cv0.reshape(s, SUPER * c, 3),
        cv1.reshape(s, SUPER * c, 3),
        cv2.reshape(s, SUPER * c, 3),
        real_mask.reshape(s, SUPER * c),
    )
    super_spheres = np.zeros((s, 8), np.float32)
    super_spheres[:, 0:3] = sctr
    super_spheres[:, 3] = srad
    super_spheres[:, 4:7] = shalf * (1.0 + 1e-5)

    real_any = real_mask.reshape(-1)
    allpts = np.concatenate([v0[real_any], v1[real_any], v2[real_any]], axis=0)
    if len(allpts) == 0:
        slo = np.zeros(3)
        shi = np.zeros(3)
    else:
        slo = allpts.min(axis=0)
        shi = allpts.max(axis=0)
    pad_abs = 1e-5 * max(1.0, float(np.abs(np.concatenate([slo, shi])).max()))
    scene_aabb = np.zeros(8, np.float32)
    scene_aabb[0:3] = slo - pad_abs
    scene_aabb[3:6] = shi + pad_abs

    rows = np.zeros((m_pad, STORE_ROWS, c), np.float32)
    rows[:, 0:3, :] = cv0.transpose(0, 2, 1)
    rows[:, 3:6, :] = (cv1 - cv0).transpose(0, 2, 1)
    rows[:, 6:9, :] = (cv2 - cv0).transpose(0, 2, 1)
    # group SUPER consecutive clusters' columns into one DMA-able row block
    rows = rows.reshape(s, SUPER, STORE_ROWS, c).transpose(0, 2, 1, 3)
    rows = rows.reshape(s, STORE_ROWS, SUPER * c)

    return ClusterSet(
        rows=jnp.asarray(rows),
        spheres=jnp.asarray(spheres),
        super_spheres=jnp.asarray(super_spheres),
        scene_aabb=jnp.asarray(scene_aabb),
        cluster_size=c,
    )
