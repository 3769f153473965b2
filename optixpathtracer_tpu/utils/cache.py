"""Persistent compilation cache (the NVRTC-JIT + PTX-cache equivalent).

Reference: sutil/sutil.cpp getPtxFromCuString (:944-1014) JIT-compiles device
code at startup and getInputData caches results in-process (:1077-1121) with
a disk PTX fallback. jax.jit is the JIT; this helper turns on jax's
persistent on-disk cache so recompiles across processes hit disk instead of
the (slow, remote on this setup) compiler.
"""
from __future__ import annotations

import os


def _host_cpu_tag() -> str:
    """Hash of the host's CPU feature flags. XLA:CPU cache entries are AOT
    results targeted at the COMPILING host's features; loading one compiled
    on a different machine is undefined behavior (cpu_aot_loader:
    'could lead to execution errors such as SIGILL'). Keying the directory
    by the feature set makes cross-machine entries unreachable — defense in
    depth for cache dirs that survive across driver machines. (Note:
    cpu_aot_loader also warns about '+prefer-no-scatter/+prefer-no-gather'
    on every SAME-host load — those are XLA pseudo-features absent from
    /proc/cpuinfo; that warning alone is benign.)"""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nohost"


def enable_compilation_cache(path: str | None = None, min_compile_secs: float = 0.5) -> str:
    import jax

    path = path or os.environ.get(
        "OPTIXPT_CACHE_DIR", os.path.expanduser("~/.cache/optixpathtracer_tpu/jax")
    )
    path = os.path.join(path, _host_cpu_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
