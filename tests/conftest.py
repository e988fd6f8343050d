"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Sharding/mesh tests run against a fake 8-chip backend
(``--xla_force_host_platform_device_count=8``) per SURVEY.md §4; TPU hardware
is exercised by ``bench.py``, not the unit suite.

Note: the environment's axon sitecustomize programmatically selects the
tunneled-TPU platform (overriding ``JAX_PLATFORMS``), so the CPU backend is
forced via ``jax.config`` here, before any test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Opt-in persistent compile cache for faster repeat suite runs (each CPU
# compile is 10-40 s on this 1-core box; cache hits load in <1 s). Opt-in
# because the XLA:CPU AOT loader logs noisy machine-feature warnings on
# every hit: SFHVAE_TEST_CACHE=/path/to/cache pytest tests/
_cache = os.environ.get("SFHVAE_TEST_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
