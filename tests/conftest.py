"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual CPU mesh exactly as JAX projects fake pods.  Must run before the
first jax import.
"""

import os

# force CPU even when the environment preselects a TPU platform (axon);
# jax may already be imported by sitecustomize, so use config.update rather
# than env vars (which are only read at first import)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules whose tests are compile-heavy (>10 s each on CPU).  The default
# run (pytest.ini addopts) skips these; `pytest -m ""` runs everything.
_SLOW_MODULES = {
    "test_cascade", "test_convert_full", "test_semantic_stability",
    "test_parallel", "test_sp_coarse", "test_sharded_eval",
    "test_training_learns", "test_fine_trainer", "test_refine_trainer",
    "test_reference_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(18027)  # the reference seed
