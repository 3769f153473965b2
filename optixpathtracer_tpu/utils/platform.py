"""Platform-aware configuration defaults.

The traversal backends have opposite platform affinities (PERF_NOTES.md):
lockstep is fast on CPU and pathological on TPU (per-iteration gather walls);
the cluster backend (Pallas block-sparse sweep) is the TPU default — exact,
gather-free, and measured fastest at every scene size tried. Dispatches
through the TPU tunnel also face an RPC deadline, so big launches are
chunked there.
"""
from __future__ import annotations

import dataclasses

import jax

from ..engine.wavefront import RenderConfig


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "METAL")


# rays per sequential dispatch on TPU: big enough to amortize dispatch
# overhead AND keep sorted wavefronts dense (bigger dispatches measured
# faster: 480k-ray dispatches beat 240k by ~5%), small enough to stay
# under the tunnel's RPC deadline
TPU_DISPATCH_RAYS = 524288


def auto_tune(cfg: RenderConfig, num_triangles: int | None = None) -> RenderConfig:
    """Adjust a RenderConfig for the active platform (and scene size).

    TPU: the cluster backend (exact; ops/traverse_cluster.py), launch
    chunked under the tunnel's dispatch deadline.
    CPU: the lockstep per-ray traversal is fastest and exact.
    """
    del num_triangles  # cluster is the right TPU choice at every size tried
    if not on_tpu():
        return dataclasses.replace(cfg, traversal="lockstep", dispatch_tiles=1)
    rays = cfg.width * cfg.height
    tiles = max(1, rays // TPU_DISPATCH_RAYS)
    return dataclasses.replace(
        cfg, traversal="cluster", dispatch_tiles=tiles, sort_rays=True
    )
