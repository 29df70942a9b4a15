"""Test configuration: virtual 8-device CPU mesh, fp64 enabled.

Must run before jax is imported anywhere — hence plain env mutation at
module import time (pytest imports conftest first).
"""

import os
import sys

sys.setrecursionlimit(50000)  # jax 0.9 Mosaic lowering recursion depth

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# This JAX build hard-defaults jax_platforms to "axon,cpu" (the TPU tunnel),
# ignoring the env var — override via config before the backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def fixture_mtx():
    return os.path.join(os.path.dirname(__file__), "..", "data", "test.mtx")
