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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 collective participant threads on a 1-core host: one can be starved
    # past the default 40s rendezvous deadline, which LOG(FATAL)s the whole
    # process ("Termination timeout for `all reduce` ... only 7 of them
    # arrived"). Let starved participants wait instead of aborting.
    flags += (" --xla_cpu_collective_timeout_seconds=120"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
              " --xla_cpu_collective_call_terminate_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags

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
