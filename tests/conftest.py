"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 strategy).

NOTE: this environment ships with JAX_PLATFORMS=axon (a real-TPU tunnel) and
a site hook that imports jax at interpreter startup — environment variables
set here are too late.  `jax.config.update` still works because no backend
has been initialized yet.  Set STVO_TEST_TPU=1 to run the suite on the real
chip instead.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()

import jax  # noqa: E402

if os.environ.get("STVO_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    assert jax.default_backend() in ("cpu", "tpu")
