"""Test configuration: run everything on CPU with 8 virtual devices.

This is the standard JAX recipe for testing multi-chip sharding without a TPU
pod: ``xla_force_host_platform_device_count`` splits the host CPU into N
XLA devices so Mesh/pjit/shard_map paths compile and execute for real.
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some pytest plugins import jax before this conftest runs, in which case the
# env var above is read too late and tests silently run against the remote
# TPU tunnel.  Forcing the config value (allowed any time before first
# backend use) makes the CPU selection robust.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "host-platform device count flag not applied"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
