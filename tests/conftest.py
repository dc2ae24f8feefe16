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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
