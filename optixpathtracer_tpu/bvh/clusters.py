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
    """Device-resident two-level cluster acceleration structure.

    Instancing (the reference's IAS over per-mesh GAS, sutil/Scene.cpp:
    1071-1150): the traversal walks ENTRIES — (instance, mesh-supercluster)
    pairs — instead of raw superclusters. Each entry carries world-space
    bounds, the row index of its mesh super's shared triangle block (the
    BLAS — stored once however many instances reference it), and a transform
    id; the sweep kernel moves the ray block into instance space per visit.
    t is invariant under the affine map (A(o+td)+b = (Ao+b) + t(Ad)), so all
    distance/early-exit logic stays in world units. A non-instanced scene is
    the identity special case (entries == supers, one identity transform).
    """

    rows: Array  # (S_mesh, 16, SUPER*C) f32 triangle rows [v0 | e1 | e2 |
    #              pad] in MESH-LOCAL space, grouped by supercluster;
    #              columns [cluster0 tris | cluster1 tris ...]
    spheres: Array  # (E*SUPER, 8) f32 per-entry-member WORLD bounding
    #                 spheres [cx cy cz r hx hy hz 0]
    super_spheres: Array  # (E, 8) f32 per-entry WORLD bounding spheres
    scene_aabb: Array  # (8,) f32 [lox loy loz hix hiy hiz 0 0]: whole-scene
    #   WORLD box; rays' reach is capped at its exit (no hit can lie
    #   beyond), which makes the sweep's early exit effective for sky rays
    entry_row: Array  # (E,) i32: rows index of each entry's mesh super
    entry_xf: Array  # (E,) i32: transform id of each entry
    xf_inv: Array  # (I, 16) f32 world->local [A row-major 9 | b 3 | pad]
    xf_fwd: Array  # (I, 16) f32 local->world (shading: vertices)
    xf_invt: Array  # (I, 16) f32 inverse-transpose 3x3 (shading: normals)
    cluster_size: int = dataclasses.field(metadata=dict(static=True))
    instanced: bool = dataclasses.field(default=False, metadata=dict(static=True))
    tri_map: Array | None = None  # (num_slots,) i32 slot -> scene triangle id,
    #   or None when slot order == scene order. Lets the cluster backend use
    #   its own spatially-repacked triangle order (treelet_order) while
    #   HitRecord.tri stays interchangeable with the other backends.

    @property
    def num_supers(self) -> int:
        return self.rows.shape[0]

    @property
    def num_entries(self) -> int:
        return self.super_spheres.shape[0]

    @property
    def num_clusters(self) -> int:
        return self.spheres.shape[0]

    @property
    def num_slots(self) -> int:
        """Total triangle slots (num_entries * SUPER * cluster_size)."""
        return self.num_clusters * self.cluster_size


def treelet_order(centroids: np.ndarray, cluster_size: int, group: int = SUPER) -> np.ndarray:
    """Spatial repacking permutation: every aligned `cluster_size` run of the
    returned order is a spatially tight treelet (and aligned `cluster_size *
    group` runs are tight at the supercluster granule).

    Recursive longest-axis median partition of triangle centroids, with the
    split point snapped to a cluster-aligned multiple so treelet boundaries
    coincide with cluster boundaries. This replaces raw Morton-run clustering,
    whose runs straddle Morton cell boundaries and produce fat bounding
    spheres (measured: median cluster radius 7.3 vs 1.9 world units on the
    150k-tri bench city — per-ray candidate clusters drop ~3x). The role of
    the reference's SAH-optimized optixAccelBuild tree quality
    (SimplePathtracer.cpp:457-601), re-cast for fixed-size clusters.

    Dispatches to the native C++ builder when available (same recursion and
    split points; intra-partition order may differ from numpy argpartition,
    which is unspecified anyway — cluster tightness is the contract)."""
    from . import native as _native

    nat = _native.treelet_order(centroids, cluster_size, group)
    if nat is not None:
        return nat
    n = len(centroids)
    ctr = np.asarray(centroids, np.float64)
    out = np.empty(n, np.int64)
    pos = 0
    big = int(cluster_size) * int(group)
    c = int(cluster_size)
    stack = [np.arange(n, dtype=np.int64)]
    while stack:
        ids = stack.pop()
        k = len(ids)
        if k <= c:
            out[pos : pos + k] = ids
            pos += k
            continue
        sub = ctr[ids]
        ax = int(np.argmax(sub.max(axis=0) - sub.min(axis=0)))
        align = big if k > big else c
        split = int(round((k / 2) / align)) * align
        split = max(align, min(split, ((k - 1) // align) * align))
        part = np.argpartition(sub[:, ax], split)
        stack.append(ids[part[split:]])  # right — emitted after left
        stack.append(ids[part[:split]])  # left — popped (emitted) first
    return out


def _identity_xf():
    ident = np.zeros((1, 16), np.float32)
    ident[0, 0] = ident[0, 4] = ident[0, 8] = 1.0
    return ident


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
    tri_map: np.ndarray | None = None,
) -> ClusterSet:
    """Build the ClusterSet from spatially-sorted triangles.

    sorted_v*: (T, 3) float arrays in Morton/BVH order (consecutive runs are
    spatially tight, which is what makes fixed-size clusters usable as
    bounding volumes). Triangles at index >= num_real are padding and are
    replaced by degenerate never-hit triangles (zero normal => det == 0).
    """
    tb = _cluster_tables(sorted_v0, sorted_v1, sorted_v2, num_real, cluster_size)
    ident = _identity_xf()
    sn = tb["rows"].shape[0]
    tm = None
    if tri_map is not None:
        n_slots = tb["spheres"].shape[0] * int(cluster_size)
        full = np.zeros(n_slots, np.int32)
        full[: len(tri_map)] = np.asarray(tri_map, np.int32)
        tm = jnp.asarray(full)
    return ClusterSet(
        tri_map=tm,
        rows=jnp.asarray(tb["rows"]),
        spheres=jnp.asarray(tb["spheres"]),
        super_spheres=jnp.asarray(tb["super_spheres"]),
        scene_aabb=jnp.asarray(tb["scene_aabb"]),
        entry_row=jnp.arange(sn, dtype=jnp.int32),
        entry_xf=jnp.zeros((sn,), jnp.int32),
        xf_inv=jnp.asarray(ident),
        xf_fwd=jnp.asarray(ident),
        xf_invt=jnp.asarray(ident),
        cluster_size=int(cluster_size),
        instanced=False,
    )


def _cluster_tables(sorted_v0, sorted_v1, sorted_v2, num_real, cluster_size):
    """Table stage shared by the plain and instanced builders. Native C++
    fast path (bit-exact, tests/test_accel_native.py) with numpy fallback."""
    from . import native as _native

    # the native kernel reads f32; only exact when the input already is
    if all(np.asarray(v).dtype == np.float32
           for v in (sorted_v0, sorted_v1, sorted_v2)):
        nat = _native.cluster_tables(
            sorted_v0, sorted_v1, sorted_v2, int(num_real), int(cluster_size),
        )
        if nat is not None:
            return nat
    return _cluster_tables_np(sorted_v0, sorted_v1, sorted_v2, num_real,
                              cluster_size)


def _cluster_tables_np(sorted_v0, sorted_v1, sorted_v2, num_real, cluster_size):
    """Numpy table stage — the reference semantics for the native path."""
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

    lo6 = np.concatenate([scene_aabb[0:3], scene_aabb[3:6]])
    return dict(
        rows=rows, spheres=spheres, super_spheres=super_spheres,
        scene_aabb=scene_aabb, local_aabb=lo6,
    )


def _entry_tables(tb: dict, transforms: np.ndarray):
    """World-space per-instance entry tables from local cluster tables.

    transforms: (I, 4, 4) local->world affine matrices. Conservative world
    bounds: sphere radius scaled by each matrix's largest singular value;
    half extents by |A|."""
    xf = np.asarray(transforms, np.float64)
    i_n = xf.shape[0]
    a = xf[:, :3, :3]
    b = xf[:, :3, 3]
    sigma = np.linalg.svd(a, compute_uv=False)[:, 0]  # (I,)

    def world_spheres(local):  # (G, 8) -> (I*G, 8), instance-major
        ctr = local[:, 0:3]
        cw = np.einsum("iab,gb->iga", a, ctr) + b[:, None, :]
        rw = local[None, :, 3] * sigma[:, None] * (1.0 + 1e-6)
        hw = np.einsum("iab,gb->iga", np.abs(a), local[:, 4:7])
        g = local.shape[0]
        out = np.zeros((i_n * g, 8), np.float32)
        out[:, 0:3] = cw.reshape(-1, 3)
        out[:, 3] = rw.reshape(-1)
        out[:, 4:7] = hw.reshape(-1, 3)
        return out

    esph = world_spheres(tb["spheres"])
    esup = world_spheres(tb["super_spheres"])

    # world scene AABB: union of the transformed local-AABB corners
    lo, hi = tb["local_aabb"][0:3], tb["local_aabb"][3:6]
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])]
    )  # (8, 3)
    wc = np.einsum("iab,gb->iga", a, corners) + b[:, None, :]
    wlo = wc.reshape(-1, 3).min(axis=0)
    whi = wc.reshape(-1, 3).max(axis=0)
    pad_abs = 1e-5 * max(1.0, float(np.abs(np.concatenate([wlo, whi])).max()))
    aabb = np.zeros(8, np.float32)
    aabb[0:3] = wlo - pad_abs
    aabb[3:6] = whi + pad_abs

    a_inv = np.linalg.inv(a)
    b_inv = -np.einsum("iab,ib->ia", a_inv, b)

    def pack(mat3, trans):
        out = np.zeros((i_n, 16), np.float32)
        out[:, 0:9] = mat3.reshape(i_n, 9)
        if trans is not None:
            out[:, 9:12] = trans
        return out

    sn = tb["super_spheres"].shape[0]
    return dict(
        spheres=esph,
        super_spheres=esup,
        scene_aabb=aabb,
        entry_row=np.tile(np.arange(sn, dtype=np.int32), i_n),
        entry_xf=np.repeat(np.arange(i_n, dtype=np.int32), sn),
        xf_inv=pack(a_inv, b_inv),
        xf_fwd=pack(a, b),
        xf_invt=pack(np.linalg.inv(a).transpose(0, 2, 1), None),
    )


def build_instanced_clusters(
    sorted_v0: np.ndarray,
    sorted_v1: np.ndarray,
    sorted_v2: np.ndarray,
    num_real: int,
    transforms: np.ndarray,
    cluster_size: int = 128,
) -> ClusterSet:
    """Instanced ClusterSet: geometry stored ONCE (mesh-local BLAS rows),
    one entry per (instance, supercluster) with world bounds + transform id
    — the reference's IAS-over-GAS (sutil/Scene.cpp:1071-1150) done the
    cluster way. Update transforms with `update_instance_transforms` (no
    geometry rebuild)."""
    tb = _cluster_tables(sorted_v0, sorted_v1, sorted_v2, num_real, cluster_size)
    et = _entry_tables(tb, transforms)
    return ClusterSet(
        rows=jnp.asarray(tb["rows"]),
        spheres=jnp.asarray(et["spheres"]),
        super_spheres=jnp.asarray(et["super_spheres"]),
        scene_aabb=jnp.asarray(et["scene_aabb"]),
        entry_row=jnp.asarray(et["entry_row"]),
        entry_xf=jnp.asarray(et["entry_xf"]),
        xf_inv=jnp.asarray(et["xf_inv"]),
        xf_fwd=jnp.asarray(et["xf_fwd"]),
        xf_invt=jnp.asarray(et["xf_invt"]),
        cluster_size=int(cluster_size),
        instanced=True,
    )


def _instance_world_tables(tbs: list, inst_proto: np.ndarray, transforms: np.ndarray):
    """TLAS entry tables over MULTIPLE prototype BLASes.

    tbs: per-prototype `_cluster_tables` dicts; inst_proto: (I,) prototype id
    per instance; transforms: (I, 4, 4) local->world. Entries are laid out
    instance-major (all of instance 0's supers, then instance 1's, ...);
    member-sphere row e*SUPER+k stays the sweep kernels' contract. This is
    the general per-mesh-GAS-pool + IAS of the reference
    (sutil/Scene.cpp:776-1150) — `_entry_tables` is its one-prototype
    special case."""
    xf = np.asarray(transforms, np.float64)
    i_n = xf.shape[0]
    inst_proto = np.asarray(inst_proto, np.int64)
    a = xf[:, :3, :3]
    b = xf[:, :3, 3]
    sigma = np.linalg.svd(a, compute_uv=False)[:, 0]  # (I,)
    row_off = np.concatenate(
        [[0], np.cumsum([tb["rows"].shape[0] for tb in tbs])]
    ).astype(np.int64)

    esph, esup, erow, exf = [], [], [], []
    wlo = np.full(3, np.inf)
    whi = np.full(3, -np.inf)
    for i in range(i_n):
        p = int(inst_proto[i])
        tb = tbs[p]
        ai, bi, si = a[i], b[i], sigma[i]

        def ws(local, ai=ai, bi=bi, si=si):  # (G, 8) local -> (G, 8) world
            out = np.zeros((local.shape[0], 8), np.float32)
            out[:, 0:3] = local[:, 0:3] @ ai.T + bi
            out[:, 3] = local[:, 3] * si * (1.0 + 1e-6)
            out[:, 4:7] = local[:, 4:7] @ np.abs(ai).T
            return out

        esph.append(ws(tb["spheres"]))
        esup.append(ws(tb["super_spheres"]))
        sn = tb["super_spheres"].shape[0]
        erow.append(row_off[p] + np.arange(sn, dtype=np.int64))
        exf.append(np.full(sn, i, np.int32))
        lo, hi = tb["local_aabb"][0:3], tb["local_aabb"][3:6]
        corners = np.array(
            [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
             for z in (lo[2], hi[2])]
        )
        wc = corners @ ai.T + bi
        wlo = np.minimum(wlo, wc.min(axis=0))
        whi = np.maximum(whi, wc.max(axis=0))

    pad_abs = 1e-5 * max(1.0, float(np.abs(np.concatenate([wlo, whi])).max()))
    aabb = np.zeros(8, np.float32)
    aabb[0:3] = wlo - pad_abs
    aabb[3:6] = whi + pad_abs

    a_inv = np.linalg.inv(a)
    b_inv = -np.einsum("iab,ib->ia", a_inv, b)

    def pack(mat3, trans):
        out = np.zeros((i_n, 16), np.float32)
        out[:, 0:9] = mat3.reshape(i_n, 9)
        if trans is not None:
            out[:, 9:12] = trans
        return out

    return dict(
        spheres=np.concatenate(esph, axis=0),
        super_spheres=np.concatenate(esup, axis=0),
        scene_aabb=aabb,
        entry_row=np.concatenate(erow).astype(np.int32),
        entry_xf=np.concatenate(exf),
        xf_inv=pack(a_inv, b_inv),
        xf_fwd=pack(a, b),
        xf_invt=pack(np.linalg.inv(a).transpose(0, 2, 1), None),
    )


def build_tlas_clusters(
    proto_tables: list,
    inst_proto: np.ndarray,
    transforms: np.ndarray,
    cluster_size: int = 128,
) -> ClusterSet:
    """General TLAS ClusterSet: a POOL of prototype BLASes (each stored once)
    + one entry per (instance, prototype supercluster) with world bounds and
    a transform id — the reference's multi-GAS pool + IAS with per-instance
    sbtOffset (sutil/Scene.cpp:776-1150). `build_instanced_clusters` is the
    single-prototype special case. Update transforms without a geometry
    rebuild via `update_tlas_transforms`."""
    rows = np.concatenate([tb["rows"] for tb in proto_tables], axis=0)
    et = _instance_world_tables(proto_tables, inst_proto, transforms)
    return ClusterSet(
        rows=jnp.asarray(rows),
        spheres=jnp.asarray(et["spheres"]),
        super_spheres=jnp.asarray(et["super_spheres"]),
        scene_aabb=jnp.asarray(et["scene_aabb"]),
        entry_row=jnp.asarray(et["entry_row"]),
        entry_xf=jnp.asarray(et["entry_xf"]),
        xf_inv=jnp.asarray(et["xf_inv"]),
        xf_fwd=jnp.asarray(et["xf_fwd"]),
        xf_invt=jnp.asarray(et["xf_invt"]),
        cluster_size=int(cluster_size),
        instanced=True,
    )


def update_tlas_transforms(
    cs: ClusterSet, proto_tables: list, inst_proto: np.ndarray,
    transforms: np.ndarray,
) -> ClusterSet:
    """New per-instance transforms, SAME prototype geometry (rows untouched)
    — the general form of `update_instance_transforms`."""
    et = _instance_world_tables(proto_tables, inst_proto, transforms)
    return dataclasses.replace(
        cs,
        spheres=jnp.asarray(et["spheres"]),
        super_spheres=jnp.asarray(et["super_spheres"]),
        scene_aabb=jnp.asarray(et["scene_aabb"]),
        xf_inv=jnp.asarray(et["xf_inv"]),
        xf_fwd=jnp.asarray(et["xf_fwd"]),
        xf_invt=jnp.asarray(et["xf_invt"]),
    )


def update_instance_transforms(
    cs: ClusterSet, local_tables: dict, transforms: np.ndarray
) -> ClusterSet:
    """New transforms, SAME geometry: only the small world-bound/transform
    tables are recomputed and re-uploaded; `rows` (the BLAS) is untouched —
    this is what makes per-frame rigid animation cheap (the reference
    rebuilds only its IAS, Scene.cpp:1071)."""
    et = _entry_tables(local_tables, transforms)
    return dataclasses.replace(
        cs,
        spheres=jnp.asarray(et["spheres"]),
        super_spheres=jnp.asarray(et["super_spheres"]),
        scene_aabb=jnp.asarray(et["scene_aabb"]),
        xf_inv=jnp.asarray(et["xf_inv"]),
        xf_fwd=jnp.asarray(et["xf_fwd"]),
        xf_invt=jnp.asarray(et["xf_invt"]),
    )
