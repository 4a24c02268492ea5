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


def make_mesh_for_batch(batch_size: int, *, model_parallel: int = 1) -> Mesh:
    """``make_mesh()`` with the data axis clamped to divide ``batch_size``.

    The training CLIs take arbitrary ``--batch-size``; on a host whose
    device count does not divide it (e.g. batch 2 on an 8-chip slice, or
    the 8-virtual-CPU test mesh), sharding the batch axis would fail at
    ``device_put``. Use the largest device count d <= n with
    d*model_parallel | batch_size*model_parallel and d | n, i.e.
    gcd(n_data, batch_size) data-parallel ways — full DP when divisible,
    graceful narrowing otherwise."""
    import math

    devices = jax.devices()
    n_data = len(devices) // model_parallel
    d = math.gcd(n_data, batch_size) if batch_size > 0 else n_data
    if d < n_data:
        print(
            f"note: batch {batch_size} not divisible by {n_data} data-parallel "
            f"devices; using {d}-way DP over the first {d * model_parallel} devices"
        )
    return make_mesh(n_devices=d * model_parallel, model_parallel=model_parallel)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/page) axis over the data axis (and the
    dcn axis too on a hybrid mesh — pages are dp-sharded across both)."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a multi-step super-batch ``(k, batch, ...)``: the
    leading step axis stays replicated (it is consumed sequentially by
    ``lax.scan``), the batch axis shards like ``batch_sharding``."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(None, (DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, opt state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays batch-sharded on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


# -- multi-host (DCN) -------------------------------------------------------
#
# Within one slice, collectives ride ICI; across hosts/slices they ride
# the data-center network. JAX's runtime IS the comm backend (SURVEY.md
# section 5 "Distributed communication backend"): one
# ``jax.distributed.initialize`` call per process, then the SAME pjit
# train steps run globally — GSPMD decomposes each gradient all-reduce
# into an intra-slice ICI reduce-scatter + inter-slice DCN all-reduce +
# ICI all-gather on its own. Runbook: docs/STATUS.md "Multi-host".

DCN_AXIS = "dcn"


def initialize_distributed(
    coordinator_address: str | None = None,
    *,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
) -> None:
    """Join (or bootstrap) the multi-process JAX runtime.

    On TPU pods all arguments come from the environment and may be
    omitted. For CPU/GPU-style launches pass them explicitly, e.g. the
    2-process localhost harness in tests/test_multihost_dcn.py:

        initialize_distributed("localhost:12345", num_processes=2,
                               process_id=rank)
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(
    *, model_parallel: int = 1, devices: Sequence[Any] | None = None
) -> Mesh:
    """(dcn, data, model) mesh: the outer axis spans slices/hosts (DCN),
    the inner axes stay inside one slice (ICI).

    Devices are grouped by ``slice_index`` when the platform reports one
    (multi-slice TPU), else by owning process (multi-host CPU/GPU, and
    the localhost test harness). Shard batches with ``batch_sharding``
    — it folds dcn+data into the page axis, so gradient reductions are
    hierarchical: dense intra-slice traffic on ICI, one slice-sum hop
    on DCN.
    """
    all_devs = list(devices) if devices is not None else jax.devices()
    slices = {getattr(d, "slice_index", None) for d in all_devs}
    # group by slice only when the platform actually distinguishes
    # slices (multi-slice TPU); otherwise (CPU processes, single-slice
    # pods — everything reports slice 0/None) group by owning process
    if len(slices) > 1 and None not in slices:
        def _group(d):
            return d.slice_index
    else:
        def _group(d):
            return d.process_index

    devs = sorted(all_devs, key=lambda d: (_group(d), d.id))
    groups = sorted({_group(d) for d in devs})
    n_groups = max(1, len(groups))
    per = len(devs) // n_groups
    assert per * n_groups == len(devs), (len(devs), n_groups)
    assert per % model_parallel == 0, (per, model_parallel)
    arr = np.asarray(devs).reshape(n_groups, per // model_parallel, model_parallel)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
