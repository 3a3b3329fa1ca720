"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware, and keep tests independent of the one real
chip available in the driver environment.

Note: this container's sitecustomize registers the axon TPU plugin (and may
import jax) at interpreter startup, so mutating JAX_PLATFORMS in the
environment here is too late -- the env var was already read. Force the
platform through jax.config instead, which wins as long as no backend has
been initialized yet, and clear PALLAS_AXON_POOL_IPS so nothing re-registers
the tunnel."""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got %s" % jax.devices())
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(42)
