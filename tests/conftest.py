"""Test env: force CPU backend with 8 virtual devices BEFORE jax import.

This is the standard JAX trick for testing `jax.sharding.Mesh` collectives
without a TPU pod (SURVEY.md section 4): DP sharding tests run against a
fake 8-device CPU mesh; the real-chip throughput gate lives in bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
