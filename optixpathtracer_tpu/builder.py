"""Scene compilation: host meshes -> (device SceneData, BVH).

The single entry point that replaces the reference's buildAccel + buildSBT
sequence (SimplePathtracer.cpp:457-601, :390-455): flatten meshes, build the
LBVH (device-side), and upload the triangle soup in BVH-sorted order so leaf
ranges are contiguous.
"""
from __future__ import annotations

from typing import NamedTuple

from .bvh.lbvh import BVH, build_bvh
from .core.scene import HostScene, SceneData, device_scene_from_sorted


class CompiledScene(NamedTuple):
    scene: SceneData
    bvh: BVH
    num_triangles: int  # real (unpadded) triangle count


def compile_scene(host: HostScene, leaf_size: int = 4) -> CompiledScene:
    flat = host.flatten()
    v0, v1, v2 = flat["v"]
    res = build_bvh(v0, v1, v2, leaf_size=leaf_size)
    scene = device_scene_from_sorted(flat, res.order, res.padded_count)
    return CompiledScene(scene=scene, bvh=res.bvh, num_triangles=len(v0))
