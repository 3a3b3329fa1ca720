"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware, and keep tests independent of the one real
chip available in the driver environment.

Note: this container's sitecustomize registers the axon TPU plugin whenever
PALLAS_AXON_POOL_IPS is set, and that registration overrides JAX_PLATFORMS --
so the variable must be cleared, not just defaulted."""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
