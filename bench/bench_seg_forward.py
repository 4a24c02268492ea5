"""Config 1 (BASELINE.md:21): segmentation forward, one 512x512 page.

The canonical config is latency-shaped (batch 1). ``vs_baseline`` is
pages/s over the per-chip north-star share; the parity side of config 1
(CPU fp32 fidelity) is covered by tests/test_models_parity.py.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from bench.common import TARGET_PAGES_PER_SEC_PER_CHIP, emit, emit_failure

METRIC = "seg_forward_512px_pages_per_sec"


def main(batch: int = 1, size: int = 512, k: int = 20, backbone: str = "mobilenet_v2", head: str = "mini"):
    from bench.common import time_scan
    from text_segmentation_image_inpainting_tpu.models import TextSegmenter

    seg = TextSegmenter(backbone=backbone, head=head, dtype=jnp.bfloat16)
    pages = jnp.asarray(
        np.random.default_rng(0).random((batch, size, size, 3), dtype=np.float32)
    ).astype(jnp.bfloat16)
    variables = jax.jit(seg.init)(jax.random.key(0), pages[:1])

    dt = time_scan(lambda p: seg.apply(variables, p), (pages,), k=k)
    pages_per_sec = batch / dt
    emit(METRIC, pages_per_sec, "pages/s",
         pages_per_sec / TARGET_PAGES_PER_SEC_PER_CHIP,
         batch=batch, ms_per_batch=round(dt * 1e3, 3), backbone=backbone,
         head=head)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--backbone", default="mobilenet_v2",
                   choices=("mobilenet_v2", "xception"))
    p.add_argument("--head", default="mini", choices=("mini", "deeplab"))
    args = p.parse_args()
    try:
        main(args.batch, args.size, backbone=args.backbone, head=args.head)
    except Exception as e:
        emit_failure(METRIC, "pages/s", e)
        raise
