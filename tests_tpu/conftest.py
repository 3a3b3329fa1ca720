"""Real-chip (Mosaic) test lane — opt-in via `make tpu-test`.

Unlike tests/conftest.py this does NOT force the CPU backend: it requires a
real TPU device so the Pallas kernels compile through Mosaic rather than
interpret mode, validating actual on-chip numerics. The whole session skips
cleanly when no TPU is attached (e.g. in CI), so the lane can live in the
default `make all` chain without breaking CPU-only environments.
"""

import os

# Make sure nothing inherited from a unit-test environment forces interpret
# mode or the CPU platform onto this session.
os.environ.pop("NIGHTLIGHT_PALLAS_INTERPRET", None)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


def pytest_collection_modifyitems(config, items):
    if not _tpu_available():
        skip = pytest.mark.skip(reason="no TPU device attached; run under the axon tunnel")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def tpu_cache():
    """Enable the persistent compile cache (remote compiles run 2-200s)."""
    cache = os.path.expanduser("~/.cache/nightlight_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache


@pytest.fixture
def rng():
    return np.random.default_rng(42)
