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


@pytest.fixture()
def rng(request):
    # Function-scoped with a per-test seed derived from the test name, so a
    # test's draws do not depend on which other tests ran before it (a
    # session-scoped stream made results depend on pytest selection scope).
    seed = int.from_bytes(request.node.name.encode()[:8].ljust(8, b"\0"),
                          "little") % (2**31)
    return np.random.default_rng(seed)


def pytest_configure(config):
    assert jax.default_backend() in ("cpu", "tpu")
