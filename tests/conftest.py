"""Test env: 8 virtual CPU devices for mesh/DP tests, CPU as default.

This is the standard JAX trick for testing `jax.sharding.Mesh`
collectives without a TPU pod (SURVEY.md section 4). Caveat for THIS
environment: the shell exports ``JAX_PLATFORMS=axon`` (the tunneled TPU
plugin) and the axon backend initializes regardless of the usual
``JAX_PLATFORMS=cpu`` override — so we force the *default device* to
CPU after import instead, and build meshes from ``jax.devices("cpu")``.
"""

import os

# must be set before jax import so the CPU client is created with 8 devices
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

from text_segmentation_image_inpainting_tpu.utils.hermetic import (  # noqa: E402
    drop_non_cpu_backends,
)

# Deregister the tunneled-TPU backend before anything initializes: the
# suite is CPU-only, and during a tunnel outage even jax.devices("cpu")
# hangs inside the plugin's init retry loop (docs/STATUS.md gotchas).
# Falls through harmlessly if a backend is already live.
drop_non_cpu_backends()

jax.config.update("jax_default_matmul_precision", "highest")
_cpus = jax.devices("cpu")
assert len(_cpus) == 8, f"expected 8 virtual CPU devices, got {len(_cpus)}"
jax.config.update("jax_default_device", _cpus[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def cpu_devices():
    return _cpus
