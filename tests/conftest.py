"""Test environment: force an 8-device CPU mesh before JAX initializes.

The driver validates multi-chip sharding the same way (SURVEY §4): tests
must not depend on TPU hardware. This conftest is imported by pytest
before any test module imports jax.
"""

import os

# Force CPU with 8 virtual devices. NOTE: this image's sitecustomize
# (PYTHONPATH=/root/.axon_site) imports jax before conftest runs and the
# environment pins JAX_PLATFORMS=axon (the TPU tunnel), so the env var
# is too late — jax.config.update still works because no backend has
# initialized yet. XLA_FLAGS is read at backend init, so setting it here
# is early enough.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls are downcast by default on this platform; parity tests
# compare against torch fp32, so force full precision in tests.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite is dominated by CPU compiles of
# jitted programs; caching them makes repeat runs several times faster.
# The dir is keyed by a host-ISA fingerprint: XLA:CPU cache entries are
# AOT executables for the exact compile host, and this box migrates
# between machines across sessions (cpu_aot_loader SIGILL warnings
# observed when reusing a fixed path).
def _host_cache_dir():
    import hashlib
    import platform

    finger = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    finger += " " + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        finger += " " + platform.processor()
    h = hashlib.sha256(finger.encode()).hexdigest()[:12]
    return f"/tmp/jax_test_cache_{h}"


jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
