"""Scene compilation: host meshes -> (device SceneData, acceleration structures).

The single entry point that replaces the reference's buildAccel + buildSBT
sequence (SimplePathtracer.cpp:457-601, :390-455): flatten meshes, build the
acceleration structures host-side in vectorized numpy, and upload the
triangle soup in Morton/BVH-sorted order so leaf and cluster ranges are
contiguous slices.

Three structures serve the three traversal backends (ops/):
  bvh      — binary LBVH for the lockstep backend (CPU-fast, exact)
  wide     — W-wide collapsed BVH for the BFS worklist backend
  clusters — Morton-run triangle clusters for the Pallas cluster backend
             (the TPU default; exact, gather-free)
All three index the same sorted triangle order, so HitRecord.tri is
interchangeable across backends.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from .bvh.clusters import (
    SUPER,
    ClusterSet,
    _cluster_tables,
    build_clusters,
    build_instanced_clusters,
    build_tlas_clusters,
    treelet_order,
)
from .bvh.lbvh import BVH, build_bvh
from .bvh.wide import WideBVH, build_wide
from .core.scene import HostScene, SceneData, device_scene_from_sorted


class CompiledScene(NamedTuple):
    scene: SceneData
    bvh: Optional[BVH]  # None for instanced scenes (cluster backend only)
    num_triangles: int  # real (unpadded) triangle count
    wide: Optional[WideBVH] = None  # BFS-backend acceleration structure
    clusters: Optional[ClusterSet] = None  # cluster-backend structure


def compile_scene(
    host: HostScene,
    leaf_size: int = 4,
    wide_width: int = 8,
    build_wide_bvh: bool = True,
    compressed_nodes: bool = False,
    build_cluster_set: bool = True,
    cluster_size: int = 128,
) -> CompiledScene:
    flat = host.flatten()
    v0, v1, v2 = flat["v"]
    res = build_bvh(v0, v1, v2, leaf_size=leaf_size)
    scene = device_scene_from_sorted(flat, res.order, res.padded_count)

    wide = None
    if build_wide_bvh:
        h = res.host  # host copies — never download device arrays (tunnel!)
        wide = build_wide(
            h["left"], h["right"], h["lmin"], h["lmax"], h["rmin"], h["rmax"],
            np.asarray(v0)[res.order],
            np.asarray(v1)[res.order],
            np.asarray(v2)[res.order],
            leaf_size=leaf_size,
            width=wide_width,
            compressed=compressed_nodes,
        )

    clusters = None
    if build_cluster_set:
        # scene arrays are padded to res.padded_count by repeating the last
        # sorted triangle, so every cluster tri id < padded_count maps into
        # the device scene arrays; cluster-level padding beyond that is
        # degenerate (never hit, never returned).
        # The cluster backend gets its OWN triangle order — a treelet
        # repacking where every aligned cluster run is spatially tight
        # (bvh/clusters.treelet_order) — with tri_map translating slot ids
        # back to scene ids so HitRecord.tri stays backend-interchangeable.
        # Centroids are order-independent per triangle, so compute them on
        # the UNSORTED arrays (one f64 alloc + in-place adds), gather once
        # by res.order for the treelet recursion, and gather the vertex
        # arrays once by the COMPOSED permutation — at Mtri scale each
        # avoided full-array gather is ~0.7 s/100 MB on one core.
        ctr = v0.astype(np.float64)
        ctr += v1
        ctr += v2
        ctr /= 3.0
        tp = treelet_order(ctr[res.order], cluster_size)
        tri_map = res.order[tp]
        clusters = build_clusters(
            np.asarray(v0)[tri_map], np.asarray(v1)[tri_map],
            np.asarray(v2)[tri_map], num_real=res.padded_count,
            cluster_size=cluster_size, tri_map=tp,
        )
    return CompiledScene(
        scene=scene,
        bvh=res.bvh,
        num_triangles=len(v0),
        wide=wide,
        clusters=clusters,
    )


def compile_instanced(
    host: HostScene,
    transforms: np.ndarray,
    cluster_size: int = 128,
) -> CompiledScene:
    """Instanced scene compile: the prototype HostScene's geometry is stored
    ONCE in local space (the BLAS); each of the (I, 4, 4) transforms adds
    only per-entry world bounds + a transform id (the IAS). Replaces the
    reference's per-mesh GAS + instance AS with per-instance sbtOffset
    (sutil/Scene.cpp:776-1150). Changing transforms later needs no geometry
    rebuild (bvh.clusters.update_instance_transforms).

    Traversal: cluster backend only (HitRecord.tri is an ENTRY-slot id;
    engine/wavefront._hit_geometry resolves it to mesh triangle + instance).
    """
    flat = host.flatten()
    v0, v1, v2 = flat["v"]
    t = len(v0)
    slot = SUPER * int(cluster_size)
    pad_to = max(slot, -(-t // slot) * slot)
    ctr = (np.asarray(v0, np.float64) + v1 + v2) / 3.0
    # instanced scenes use the treelet order globally (scene arrays ARE in
    # cluster-slot order here, so no tri_map indirection is needed)
    order = treelet_order(ctr, cluster_size)
    if pad_to > t:
        order = np.concatenate([order, np.repeat(order[-1:], pad_to - t)])
    scene = device_scene_from_sorted(flat, order, pad_to)
    sv0 = np.asarray(v0)[order]
    sv1 = np.asarray(v1)[order]
    sv2 = np.asarray(v2)[order]
    clusters = build_instanced_clusters(
        sv0, sv1, sv2, num_real=pad_to, transforms=np.asarray(transforms),
        cluster_size=cluster_size,
    )
    return CompiledScene(
        scene=scene,
        bvh=None,
        num_triangles=t * len(np.asarray(transforms)),
        wide=None,
        clusters=clusters,
    )


def compile_tlas(
    host: HostScene,
    groups: list,
    instances: list,
    cluster_size: int = 128,
    return_tables: bool = False,
):
    """General multi-BLAS TLAS compile — the reference's per-mesh GAS pool
    with batched build + an IAS of per-instance transforms and sbtOffsets
    (sutil/Scene.cpp:776-1150), the cluster way.

    host: ONE HostScene holding every prototype's meshes (so materials and
    textures flatten into one consistent table — the SBT).
    groups: list of prototypes, each a list of `host.meshes` indices (a glTF
    mesh's primitives form one prototype).
    instances: list of (prototype_index, (4, 4) local->world transform).

    Each prototype's geometry is stored ONCE in local space (its BLAS —
    treelet-ordered, padded to the cluster-slot granule); every instance
    adds only small world-bound entry tables + a transform row. Scene slot
    layout is the concatenation of the prototypes' padded slot ranges, so
    the engine's entry-slot -> triangle resolution
    (engine/wavefront._hit_geometry) needs no change.

    With return_tables=True also returns the per-prototype local tables
    (feed them to bvh.clusters.update_tlas_transforms for per-frame rigid
    animation without any geometry rebuild).
    """
    flat = host.flatten()
    v0, v1, v2 = (np.asarray(flat["v"][k]) for k in range(3))
    # mesh -> global triangle range (flatten concatenates meshes in order)
    counts = [len(np.asarray(m.indices).reshape(-1, 3)) for m in host.meshes]
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    slot = SUPER * int(cluster_size)
    orders, tables, real_counts = [], [], []
    for meshes in groups:
        gids = np.concatenate(
            [np.arange(starts[mi], starts[mi + 1]) for mi in meshes]
        )
        t = len(gids)
        assert t > 0, "empty prototype group"
        ctr = (v0[gids].astype(np.float64) + v1[gids] + v2[gids]) / 3.0
        op = gids[treelet_order(ctr, cluster_size)]
        pad_to = max(slot, -(-t // slot) * slot)
        if pad_to > t:  # duplicate-last padding (same convention as
            #             compile_instanced: a duplicated triangle yields
            #             identical hits, never wrong ones)
            op = np.concatenate([op, np.repeat(op[-1:], pad_to - t)])
        orders.append(op)
        real_counts.append(t)
        tables.append(_cluster_tables(
            v0[op], v1[op], v2[op], num_real=pad_to, cluster_size=cluster_size
        ))

    order = np.concatenate(orders)
    scene = device_scene_from_sorted(flat, order, len(order))
    inst_proto = np.asarray([p for p, _ in instances], np.int64)
    xfs = np.stack([np.asarray(m, np.float64) for _, m in instances])
    clusters = build_tlas_clusters(
        tables, inst_proto, xfs, cluster_size=cluster_size
    )
    cs = CompiledScene(
        scene=scene,
        bvh=None,
        num_triangles=int(sum(real_counts[p] for p in inst_proto)),
        wide=None,
        clusters=clusters,
    )
    if return_tables:
        return cs, tables
    return cs
