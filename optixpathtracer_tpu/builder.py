"""Scene compilation: host meshes -> (device SceneData, BVH).

The single entry point that replaces the reference's buildAccel + buildSBT
sequence (SimplePathtracer.cpp:457-601, :390-455): flatten meshes, build the
LBVH (device-side), and upload the triangle soup in BVH-sorted order so leaf
ranges are contiguous.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from .bvh.lbvh import BVH, build_bvh
from .bvh.wide import WideBVH, build_wide
from .core.scene import HostScene, SceneData, device_scene_from_sorted


class CompiledScene(NamedTuple):
    scene: SceneData
    bvh: BVH
    num_triangles: int  # real (unpadded) triangle count
    wide: Optional[WideBVH] = None  # BFS-backend acceleration structure


def compile_scene(
    host: HostScene,
    leaf_size: int = 4,
    wide_width: int = 8,
    build_wide_bvh: bool = True,
    compressed_nodes: bool = False,
) -> CompiledScene:
    flat = host.flatten()
    v0, v1, v2 = flat["v"]
    res = build_bvh(v0, v1, v2, leaf_size=leaf_size)
    scene = device_scene_from_sorted(flat, res.order, res.padded_count)

    wide = None
    if build_wide_bvh:
        sv0 = np.asarray(v0)[res.order]
        sv1 = np.asarray(v1)[res.order]
        sv2 = np.asarray(v2)[res.order]
        wide = build_wide(
            np.asarray(res.bvh.child_left),
            np.asarray(res.bvh.child_right),
            np.asarray(res.bvh.left_min.to_array()),
            np.asarray(res.bvh.left_max.to_array()),
            np.asarray(res.bvh.right_min.to_array()),
            np.asarray(res.bvh.right_max.to_array()),
            sv0,
            sv1,
            sv2,
            leaf_size=leaf_size,
            width=wide_width,
            compressed=compressed_nodes,
        )
    return CompiledScene(scene=scene, bvh=res.bvh, num_triangles=len(v0), wide=wide)
