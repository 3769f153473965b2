"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); we build the pyramid ourselves.
Multi-device sharding logic (parallel/) is exercised on 8 virtual CPU devices so
it runs anywhere, mirroring how the driver dry-runs the multi-chip path.

NOTE: this environment's sitecustomize force-registers the 'axon' TPU-tunnel
backend and overrides JAX_PLATFORMS — only jax.config.update after import
reliably pins tests to CPU (the tunnel supports one client; tests must never
grab it).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from optixpathtracer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

# persistent XLA executable cache: repeat suite runs skip recompiles (the
# golden renders are compile-dominated on CPU). OPTIXPT_NO_CACHE=1 disables
# it: jaxlib's executable serialization can abort/segfault sporadically
# under heavy concurrent load (observed on slow-tier runs alongside TPU
# jobs); correctness never depends on the cache.
if os.environ.get("OPTIXPT_NO_CACHE"):
    jax.config.update("jax_enable_compilation_cache", False)
else:
    enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _run_slow_env() -> bool:
    """RUN_SLOW=0/false/empty means OFF (conventional semantics; ADVICE r3)."""
    return os.environ.get("RUN_SLOW", "").lower() not in ("", "0", "false")


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (heavy renders; the full tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r2 weak #8): the default run must finish in
    minutes so CI/the driver can actually run it; heavy renders are the
    explicit `--slow` (or RUN_SLOW=1) tier. Every test FILE keeps at least
    one fast test so the default tier covers every subsystem (batched spp,
    chunked dispatch, BFS engine, fused + distributed foveation each have a
    small fast variant alongside their full-size slow test)."""
    if config.getoption("--slow") or _run_slow_env():
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow or set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """XLA:CPU segfaults once a process accumulates a few hundred loaded
    executables (reproduced at the same suite ordinal across different
    modules, cache-on and cache-off). Dropping compiled programs at module
    boundaries keeps the live count bounded; the persistent disk cache
    makes any cross-module recompiles cheap."""
    yield
    import jax

    jax.clear_caches()
