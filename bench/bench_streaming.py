"""Config 5 (BASELINE.md:25): data-parallel bf16 streaming throughput —
batches pulled through ``make_dataset`` (host synthesis/decode) +
``DevicePrefetcher`` (H2D overlap) into the fused pipeline.

Unlike the closed-loop configs this measures the whole producer->device
path, i.e. host starvation shows up here. On the single axon chip the
mesh is 1-wide DP; the same code drives an N-chip mesh (sharding comes
from ``shard_batch``'s NamedSharding on the prefetcher). Completion is
forced by one scalar read of the LAST batch's output: device programs
retire in dispatch order, so last-done implies all-done.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from bench.common import TARGET_PAGES_PER_SEC_PER_CHIP, emit, emit_failure

METRIC = "dp_streaming_512px_pages_per_sec"


def main(batch: int = 8, size: int = 512, n_batches: int = 30, workers: int = 2):
    from text_segmentation_image_inpainting_tpu.data.pipeline import (
        DevicePrefetcher,
        make_dataset,
    )
    from text_segmentation_image_inpainting_tpu.parallel import batch_sharding, make_mesh
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sharding = batch_sharding(mesh)

    pipe = TextRemovalPipeline()
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(size, size))
    run = pipe.jitted()

    host_it = make_dataset("seg", batch_size=batch, size=(size, size), num_workers=workers)
    pf = DevicePrefetcher(host_it, sharding=sharding, depth=3)
    try:
        # warmup: compile + fill the prefetch queue
        b = next(pf)
        clean, mask = run(seg_vars, unet_vars, b["image"].astype(jnp.bfloat16))
        float(jnp.sum(mask.astype(jnp.float32)))

        t0 = time.perf_counter()
        outs = None
        for _ in range(n_batches):
            b = next(pf)
            outs = run(seg_vars, unet_vars, b["image"].astype(jnp.bfloat16))
        float(jnp.sum(outs[1].astype(jnp.float32)))  # sync on the last batch
        dt = time.perf_counter() - t0
    finally:
        pf.close()

    pages_per_sec = batch * n_batches / dt
    emit(METRIC, pages_per_sec, "pages/s",
         pages_per_sec / TARGET_PAGES_PER_SEC_PER_CHIP,
         batch=batch, n_batches=n_batches, devices=n_dev)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--n-batches", type=int, default=30)
    p.add_argument("--workers", type=int, default=2)
    args = p.parse_args()
    try:
        main(args.batch, args.size, args.n_batches, args.workers)
    except Exception as e:
        emit_failure(METRIC, "pages/s", e)
        raise
