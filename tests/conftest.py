"""Test environment: force an 8-device CPU mesh before JAX initializes.

The driver validates multi-chip sharding the same way (SURVEY §4): tests
must not depend on TPU hardware. This conftest is imported by pytest
before any test module imports jax.
"""

import os

# Force CPU: the suite needs 8 virtual devices and fp32 determinism
# (the "axon" TPU platform may be preset in the environment).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# fp32 matmuls are downcast by default on this platform; parity tests
# compare against torch fp32, so force full precision in tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
