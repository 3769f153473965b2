"""Persistent compilation cache (the NVRTC-JIT + PTX-cache equivalent).

Reference: sutil/sutil.cpp getPtxFromCuString (:944-1014) JIT-compiles device
code at startup and getInputData caches results in-process (:1077-1121) with
a disk PTX fallback. jax.jit is the JIT; this helper turns on jax's
persistent on-disk cache so recompiles across processes hit disk instead of
the (slow, remote on this setup) compiler.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None, min_compile_secs: float = 0.5) -> str:
    import jax

    path = path or os.environ.get(
        "OPTIXPT_CACHE_DIR", os.path.expanduser("~/.cache/optixpathtracer_tpu/jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
