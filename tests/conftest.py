"""Test harness: force an 8-virtual-device CPU platform before JAX loads.

Multi-chip sharding tests run on a virtual CPU mesh (no TPU needed), per
SURVEY.md §4's consequence notes. Must set the env vars before the first
``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin and pins the platform
# programmatically, so the env var alone is not enough — override via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.key(0)
