"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since real multi-chip TPU hardware is
not available in CI; the same pjit programs run unchanged on a TPU mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
