"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so sharding/pjit paths are
exercised without TPU hardware (the standard JAX fake-cluster technique —
SURVEY.md §4e). Must set env vars before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
