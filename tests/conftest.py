"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so sharding/pjit paths are
exercised without TPU hardware (the standard JAX fake-cluster technique —
SURVEY.md §4e). Must set env vars before jax import.
"""

import os

# Force CPU unconditionally: the driver environment pre-registers a TPU
# tunnel backend (sitecustomize) that overrides the JAX_PLATFORMS env var,
# and TPU default conv/matmul precision (bf16 accumulate) breaks float32
# parity oracles — so override via jax.config, which wins over the plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
