"""Test config: force an 8-device virtual CPU platform before any JAX operation.

This is how multi-device sharding is tested without a TPU pod (SURVEY.md §4).
NOTE: this environment's sitecustomize registers the axon TPU plugin at
interpreter startup, so env vars like XLA_FLAGS=--xla_force_host_platform_
device_count are NOT reliable here — the jax.config route immediately after
`import jax` is, as long as no backend has been touched yet.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # backends already initialized; tests that need 8 devices will skip

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
