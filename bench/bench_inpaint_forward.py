"""Config 2 (BASELINE.md:22): partial-conv inpaint forward, 512x512 page
with a precomputed hole mask."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from bench.common import TARGET_PAGES_PER_SEC_PER_CHIP, emit, emit_failure

METRIC = "inpaint_forward_512px_pages_per_sec"


def main(batch: int = 1, size: int = 512, k: int = 20):
    from bench.common import time_scan
    from text_segmentation_image_inpainting_tpu.models import InpaintUNet

    unet = InpaintUNet(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pages = jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    # precomputed hole mask (1 = valid), ~8% holes like dilated text
    mask = jnp.asarray((rng.random((batch, size, size, 1)) > 0.08).astype(np.float32)).astype(
        jnp.bfloat16
    )
    variables = jax.jit(unet.init)(jax.random.key(0), pages[:1] * mask[:1], mask[:1])

    dt = time_scan(lambda p, m: unet.apply(variables, p * m, m), (pages, mask), k=k)
    pages_per_sec = batch / dt
    emit(METRIC, pages_per_sec, "pages/s",
         pages_per_sec / TARGET_PAGES_PER_SEC_PER_CHIP,
         batch=batch, ms_per_batch=round(dt * 1e3, 3))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()
    try:
        main(args.batch, args.size)
    except Exception as e:
        emit_failure(METRIC, "pages/s", e)
        raise
