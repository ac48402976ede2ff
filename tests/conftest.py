"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled — the
fake-backend analog of the reference's oracle-based test strategy
(SURVEY.md §4): numerics are checked at the reference's 1e-9 tolerances
(eggshell/constants.h:5), and multi-chip sharding is validated without
TPU hardware via xla_force_host_platform_device_count.
"""

import os

# Force CPU: the ambient environment may point JAX at a tunneled TPU
# ("axon"), which is slow to compile against and single-chip; tests want
# the 8-device virtual CPU mesh and float64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient axon (tunneled-TPU) integration overrides JAX_PLATFORMS, so
# force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (hundreds of
# jit specializations); cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/eggshell_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_worker_memory():
    """Clear jax's in-memory executable/trace caches after every test
    module: a long-lived xdist worker otherwise accumulates hundreds of
    compiled programs and eventually collides with a compile peak on
    the other worker (the round-4 worker crash).  Recompiles hit the
    persistent on-disk cache, so the wall-clock cost is deserialization
    only."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    """Deterministic NumPy RNG — ref toolkit/testing.cc:44 (RandomSeed(0))."""
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
