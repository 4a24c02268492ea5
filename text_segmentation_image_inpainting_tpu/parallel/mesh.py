"""Device mesh + sharding helpers — the framework's distribution layer.

The reference is single-process/single-GPU with no distributed subsystem
(SURVEY.md section 2.2). Here distribution is JAX-native SPMD: a 1-axis
``data`` mesh batches pages over ICI (the north-star benchmark shape,
BASELINE.json:5); gradients all-reduce via XLA collectives inserted by
GSPMD — no NCCL/MPI-style code exists anywhere in this framework.

A ``model`` axis is provisioned (size 1 by default) so conv channels
*could* shard tensor-parallel; the models are ≤ a few M params, so TP is
documented-but-unused (SURVEY.md section 2.2). The spatial/context-
parallel analogue (H×W sharding with conv halo exchange) is likewise a
documented follow-on, not v1.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    *,
    devices: Sequence[Any] | None = None,
    platform: str | None = None,
    model_parallel: int = 1,
) -> Mesh:
    """(data, model) mesh over the available devices (model=1 default).

    ``platform='cpu'`` selects the virtual CPU devices (multi-chip tests
    on a single host); default is the primary backend (TPU).
    """
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/page) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
