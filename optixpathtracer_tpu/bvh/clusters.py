"""Triangle clusters — the acceleration structure for the cluster traversal
backend (ops/traverse_cluster.py).

Replaces the role of the reference's hardware BVH (optixAccelBuild,
HelloPathtracing_original/SimplePathtracer.cpp:457-601) with a structure
designed for the TPU's strengths instead of pointer-chasing:

* Triangles (already Morton/BVH-sorted, so spatially coherent) are chopped
  into fixed-size clusters of C consecutive triangles.
* Each cluster stores its triangles pre-differenced as (9, C) float32 rows
  [v0 | e1 | e2] (e1 = v1-v0, e2 = v2-v0, computed in float64 then rounded),
  laid out so a Pallas kernel can broadcast (B,1) ray components against
  (1,C) triangle rows and evaluate Moller-Trumbore for all B x C pairs as
  pure (B,C)-shaped VPU vector ops — full float32 exactness, no gathers.
* A per-cluster bounding sphere (center, radius) and AABB support the cheap
  conservative per-ray cull that decides which clusters a ray block visits.

Exactness: a cluster either is visited (every triangle tested exactly) or is
provably unreachable by every ray in the block, so the backend has NO
truncation/overflow failure mode (unlike traverse_bfs).

Design history: an MXU formulation (per-triangle feature matrix G with
f_ray @ G = [det, u*det, v*det, t*det]) was built and measured first; at the
f32-exact precision this workload needs (HIGHEST = bf16_6x passes) the
matmul costs ~1us per 128x128 visit vs ~0.2us for the straight VPU
evaluation, and moves 7x the bytes. See PERF_NOTES.md.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NUM_ROWS = 9  # [v0x v0y v0z e1x e1y e1z e2x e2y e2z]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Device-resident cluster acceleration structure."""

    rows: Array  # (M, 9, C) float32 triangle rows [v0 | e1 | e2]
    spheres: Array  # (M, 8) float32: [cx, cy, cz, radius, half_x, half_y, half_z, 0]
    cluster_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_clusters(self) -> int:
        return self.rows.shape[0]

    @property
    def num_slots(self) -> int:
        """Total triangle slots (num_clusters * cluster_size)."""
        return self.rows.shape[0] * self.cluster_size


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
    t_pad = m * c

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

    cv0 = v0.reshape(m, c, 3)
    cv1 = v1.reshape(m, c, 3)
    cv2 = v2.reshape(m, c, 3)
    allv = np.concatenate([cv0, cv1, cv2], axis=1)  # (M, 3C, 3)
    real_mask = np.arange(t_pad).reshape(m, c) < t_real  # (M, C)
    anyreal = real_mask.any(axis=1)
    vm = np.concatenate([real_mask] * 3, axis=1)  # (M, 3C)
    big = 3.0e37
    lo = np.where(vm[:, :, None], allv, big).min(axis=1)  # (M, 3)
    hi = np.where(vm[:, :, None], allv, -big).max(axis=1)
    lo = np.where(anyreal[:, None], lo, 0.0)
    hi = np.where(anyreal[:, None], hi, 0.0)
    center = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    radius = np.sqrt((half * half).sum(axis=1))

    rows = np.empty((m, NUM_ROWS, c), np.float32)
    rows[:, 0:3, :] = cv0.transpose(0, 2, 1)
    rows[:, 3:6, :] = (cv1 - cv0).transpose(0, 2, 1)
    rows[:, 6:9, :] = (cv2 - cv0).transpose(0, 2, 1)

    spheres = np.zeros((m, 8), np.float32)
    spheres[:, 0:3] = center
    # dilate so float32 rounding of centers/radii stays conservative
    spheres[:, 3] = radius * (1.0 + 1e-5) + 1e-30
    spheres[:, 4:7] = half * (1.0 + 1e-5)

    return ClusterSet(
        rows=jnp.asarray(rows),
        spheres=jnp.asarray(spheres),
        cluster_size=c,
    )
