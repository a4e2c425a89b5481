"""Test config: force an 8-device virtual CPU platform before jax initializes.

This is how multi-device sharding is tested without a TPU pod (SURVEY.md §4):
XLA_FLAGS=--xla_force_host_platform_device_count=8 gives 8 independent CPU
devices that exercise the same Mesh/pjit code paths as real chips.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
