"""Platform-aware configuration defaults.

The two traversal backends have opposite platform affinities (PERF_NOTES.md):
lockstep is fast on CPU and pathological on TPU (per-iteration gather walls),
bfs is the reverse. Dispatches through the TPU tunnel also face an RPC
deadline, so launches must be chunked there.
"""
from __future__ import annotations

import dataclasses

import jax

from ..engine.wavefront import RenderConfig


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "METAL")


# measured crossover on v5e (PERF_NOTES.md): dense 2x faster at ~10k tris,
# parity at ~36k, bfs 4x faster at 150k
DENSE_TRI_THRESHOLD = 32768


def auto_tune(cfg: RenderConfig, num_triangles: int | None = None) -> RenderConfig:
    """Adjust a RenderConfig for the active platform (and scene size).

    TPU: small scenes use the dense no-BVH backend (exact, gather-free;
    BFS worklists also overflow on small ENCLOSED scenes); big scenes use
    bfs with the launch chunked under the tunnel's dispatch deadline.
    CPU: the lockstep per-ray traversal is fastest and exact.
    """
    if not on_tpu():
        return dataclasses.replace(cfg, traversal="lockstep", dispatch_tiles=1)
    rays = cfg.width * cfg.height
    # keep each dispatch's wavefront near ~128k rays (deadline + memory)
    tiles = max(1, rays // 131072)
    if num_triangles is not None and num_triangles <= DENSE_TRI_THRESHOLD:
        return dataclasses.replace(cfg, traversal="dense", dispatch_tiles=tiles)
    return dataclasses.replace(cfg, traversal="bfs", dispatch_tiles=tiles)
