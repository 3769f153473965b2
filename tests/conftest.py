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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
