"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (the XLA fake-backend analog called for in
SURVEY.md §4), and use full-precision matmuls so golden-parity comparisons
against the float32 PyTorch reference are meaningful."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment's sitecustomize registers a TPU plugin and
# overrides JAX_PLATFORMS; force CPU through the config API instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
