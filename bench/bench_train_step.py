"""Config 4 (BASELINE.md:24): full training step — segmentation
(BCE/dice) and inpainting (L1 + VGG perceptual/style + TV) — batch 8,
512x512, bf16 compute.

The step itself is the scan body (state is the carry), so K iterations
time real sequential updates: forward, all losses, backward, optax
update, BN-stat update — one XLA program end to end.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from bench.common import TARGET_PAGES_PER_SEC_PER_CHIP, emit, emit_failure

METRIC = "train_step_512px_pages_per_sec"

# Measured streaming-bandwidth ceiling of THIS part (docs/KERNEL_NOTES.md
# "the platform memory roofline, measured"): every path — Pallas manual
# DMA, automatic BlockSpec pipelining, XLA reduce — lands in 150-190
# GB/s; the v5e datasheet 819 GB/s is not what the part delivers. The
# floor below uses the OPTIMISTIC end (190), i.e. the floor is a lower
# bound on what any schedule could do.
MEASURED_HBM_GB_S = 190.0
# v5e bf16 MXU peak (datasheet); used for the compute-side floor.
PEAK_BF16_TFLOPS = 197.0


def _roofline_floor_ms(step_fn, state, batch) -> dict:
    """Machine-readable memory/compute floor of ONE train step.

    XLA's own cost model on the compiled program: 'bytes accessed' is
    the sum of HBM operand+output bytes over the fusions (intra-fusion
    traffic stays in VMEM and is not counted), 'flops' the MXU work.
    floor_ms = max(bytes/BW, flops/peak) — the time the step would take
    if the only cost were moving its HBM bytes at the measured ceiling
    (or spinning the MXU at peak). A measured step near this floor
    cannot be scheduled faster on this part; see docs/KERNEL_NOTES.md
    round-3 'memory roofline, measured' for the bandwidth evidence.
    """
    try:
        ca = jax.jit(step_fn).lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9
        tflops = float(ca.get("flops", 0.0)) / 1e12
        mem_ms = gb / MEASURED_HBM_GB_S * 1e3
        mxu_ms = tflops / PEAK_BF16_TFLOPS * 1e3
        return {
            "bytes_accessed_gb": round(gb, 3),
            "tflops": round(tflops, 3),
            "floor_ms": round(max(mem_ms, mxu_ms), 2),
        }
    except Exception:  # cost model unavailable on some backends
        return {}


def _time_train(step_fn, state, batch, k: int, reps: int = 3) -> float:
    @jax.jit
    def run_k(state, batch):
        def body(state, _):
            state, metrics = step_fn(state, batch)
            return state, metrics["total"]

        state, totals = lax.scan(body, state, None, length=k)
        return totals[-1]

    float(run_k(state, batch))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run_k(state, batch))
    return (time.perf_counter() - t0) / (reps * k)


def main(batch: int = 8, size: int = 512, k: int = 5):
    from text_segmentation_image_inpainting_tpu.models import (
        InpaintUNet,
        TextSegmenter,
        VGG16Features,
    )
    from text_segmentation_image_inpainting_tpu.train import (
        InpaintTrainConfig,
        SegTrainConfig,
        create_train_state,
        make_inpaint_train_step,
        make_seg_train_step,
    )

    rng = np.random.default_rng(0)
    results = {}

    # --- segmentation step ---
    seg_cfg = SegTrainConfig(image_size=(size, size))
    seg = TextSegmenter(dtype=jnp.bfloat16)
    sbatch = {
        "image": jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)),
        "mask": jnp.asarray((rng.random((batch, size, size, 1)) > 0.9).astype(np.float32)),
    }
    svars = jax.jit(seg.init)(jax.random.key(0), sbatch["image"][:1])
    sstate = create_train_state(svars, seg.apply, seg_cfg.optimizer)
    seg_step = make_seg_train_step(seg, seg_cfg)
    dt_seg = _time_train(seg_step, sstate, sbatch, k)
    results["seg_ms_per_step"] = round(dt_seg * 1e3, 2)
    seg_floor = _roofline_floor_ms(seg_step, sstate, sbatch)

    # --- inpainting step (full VGG loss bundle) ---
    inp_cfg = InpaintTrainConfig(image_size=(size, size))
    unet = InpaintUNet(dtype=jnp.bfloat16)
    vgg = VGG16Features()
    ibatch = {
        "image": jnp.asarray(rng.random((batch, size, size, 3), dtype=np.float32)),
        "mask": jnp.asarray((rng.random((batch, size, size, 1)) > 0.08).astype(np.float32)),
    }
    uvars = jax.jit(unet.init)(
        jax.random.key(1), ibatch["image"][:1] * ibatch["mask"][:1], ibatch["mask"][:1]
    )
    vgg_vars = jax.jit(vgg.init)(jax.random.key(2), ibatch["image"][:1])
    ustate = create_train_state(uvars, unet.apply, inp_cfg.optimizer)
    inp_step = make_inpaint_train_step(unet, inp_cfg, vgg_vars)
    dt_inp = _time_train(inp_step, ustate, ibatch, k)
    results["inpaint_ms_per_step"] = round(dt_inp * 1e3, 2)
    inp_floor = _roofline_floor_ms(inp_step, ustate, ibatch)

    # one "training page" = one page through BOTH stages' train steps
    pages_per_sec = batch / (dt_seg + dt_inp)
    # roofline accounting (VERDICT r3 item 2): the floor is what this
    # part could do if every byte moved at the measured HBM ceiling —
    # the line is provably unreachable when floor_pages_per_sec < 125.
    if seg_floor and inp_floor:
        floor_ms = seg_floor["floor_ms"] + inp_floor["floor_ms"]
        results["roofline_floor_ms"] = round(floor_ms, 2)
        results["roofline_floor_pages_per_sec"] = round(batch / floor_ms * 1e3, 2)
        results["roofline_bw_gb_s"] = MEASURED_HBM_GB_S
        results["bytes_accessed_gb"] = round(
            seg_floor["bytes_accessed_gb"] + inp_floor["bytes_accessed_gb"], 3
        )
        results["roofline_attained"] = round(
            floor_ms / ((dt_seg + dt_inp) * 1e3), 3
        )
    bar = results.get("roofline_floor_pages_per_sec")
    emit(METRIC, pages_per_sec, "pages/s",
         pages_per_sec / TARGET_PAGES_PER_SEC_PER_CHIP,
         bar=bar,
         bar_source="XLA cost-model bytes at measured 190 GB/s HBM ceiling "
                    "(docs/KERNEL_NOTES.md roofline)" if bar else None,
         batch=batch, **results)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--k", type=int, default=5)
    args = p.parse_args()
    try:
        main(args.batch, args.size, args.k)
    except Exception as e:
        emit_failure(METRIC, "pages/s", e)
        raise
