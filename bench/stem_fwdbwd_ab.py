"""Config-4 item: the VGG stem fwd+bwd fusion prize, settled by measurement.

VERDICT r4 task 3: the round-3 notes projected a ~20 ms prize for a
flash-style Pallas fusion of conv0-relu-conv1-relu-pool1 *fwd+bwd* with
in-kernel recompute; the forward-only A/B (docs/KERNEL_NOTES.md round-4)
broke even but did not settle the backward half. This script settles it
without building the second kernel, using only measured machine
parameters:

A (measured): XLA's stem fwd+bwd at the train step's real shape
   (2N=16 images x 512^2: the loss bundle runs VGG on out AND comp),
   timed by the in-jit weight-perturbed scan protocol, plus its XLA
   cost-model bytes/flops.

B (bound): the fastest ANY fused Pallas fwd+bwd kernel could run on
   this part, from two round-4 measurements that are properties of the
   toolchain, not of a particular kernel:
     1. Pallas DMA and MXU compute do NOT overlap (the fwd kernel timed
        as DMA + GEMM serial: 4.5 + 3.0 = 7.8 ms, KERNEL_NOTES r4);
     2. best measured DMA rate 188 GB/s (36 MB blocks), best measured
        in-kernel GEMM rate ~103 TFLOP/s bf16 (3.0 ms for conv1's
        2*16*512^2*9*64*64 = 309 GFLOP fwd tail, same table).
   B_lb = minimal_HBM_traffic / 188 GB/s + fused_flops / 103 TFLOP/s,
   where minimal traffic counts only what a perfectly fused fwd+bwd
   with in-kernel recompute MUST move (x twice, pool1 out, cotangent
   in, dx out; weight grads are noise) and fused_flops = fwd + recompute
   + dgrad + wgrad (~4x fwd — recompute is the price of not spilling
   the 512^2 x 64 intermediates the fusion exists to avoid).

If B_lb >= A, the prize is physically unavailable on this toolchain and
the config-4 bar is the roofline floor `bench_train_step` already emits
(XLA cost-model bytes at the measured 190 GB/s ceiling).

Run: python -m bench.stem_fwdbwd_ab  (real chip; ~2 min warm)
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

from flax import linen as nn

# Measured machine parameters (docs/KERNEL_NOTES.md round-4 tables).
PALLAS_DMA_GB_S = 188.0      # best: whole-image blocks, double-buffered
PALLAS_GEMM_TFLOPS = 103.0   # 309 GFLOP fwd tail in 3.0 ms
BF16 = 2  # bytes


def stem_apply(params, x):
    """conv0-relu-conv1-relu-pool1, the torchvision vgg16 stem, bf16
    compute exactly as VGG16Features runs it inside the train step."""
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), params["w0"].astype(jnp.bfloat16),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = nn.relu(y + params["b0"].astype(jnp.bfloat16))
    y = lax.conv_general_dilated(
        y, params["w1"].astype(jnp.bfloat16),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = nn.relu(y + params["b1"].astype(jnp.bfloat16))
    return nn.max_pool(y, (2, 2), strides=(2, 2))


def main(n_images: int = 16, size: int = 512, k: int = 8, reps: int = 3,
         mode: str = "full"):
    """mode: 'full' = grad wrt params AND x (the round-4 A/B);
    'dx' = grad wrt x only — the REAL step's cost (VGG is frozen:
    train/inpaint.py closes over vgg_variables, XLA never builds the
    wgrads); 'kernel' = the fused Pallas dx path (vgg_stem_bwd)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n_images, size, size, 3), np.float32), jnp.bfloat16)
    g = jnp.asarray(rng.random((n_images, size // 2, size // 2, 64), np.float32),
                    jnp.bfloat16)
    params = {
        "w0": jnp.asarray(rng.standard_normal((3, 3, 3, 64)) * 0.05, jnp.float32),
        "b0": jnp.zeros((64,), jnp.float32),
        "w1": jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32),
        "b1": jnp.zeros((64,), jnp.float32),
    }

    if mode == "kernel":
        from text_segmentation_image_inpainting_tpu.ops.pallas.vgg_stem_bwd import (
            vgg_stem_frozen,
        )

        def apply_fn(params, x):
            return vgg_stem_frozen(
                x, params["w0"], params["b0"], params["w1"], params["b1"],
                jnp.bfloat16, False,
            )
    else:
        apply_fn = stem_apply

    def loss(params, x):
        return jnp.vdot(apply_fn(params, x).astype(jnp.float32),
                        g.astype(jnp.float32))

    # 'full': grad wrt params AND x (round-4 protocol); 'dx'/'kernel':
    # x only — what the frozen-VGG train step actually computes
    fwdbwd = jax.grad(loss, argnums=(0, 1) if mode == "full" else (1,))

    @jax.jit
    def run_k(params, x):
        def body(carry, _):
            p, xx = carry
            grads = fwdbwd(p, xx)
            if mode == "full":
                gp, gx = grads
                # weight- and input-perturbed: the scan body is loop-
                # variant, nothing hoists (bench/common.py protocol)
                p = jax.tree.map(
                    lambda a, b: a + 1e-12 * b.astype(a.dtype), p, gp
                )
            else:
                (gx,) = grads
            xx = xx + (1e-12 * gx).astype(xx.dtype)
            return (p, xx), gx[0, 0, 0, 0]
        (p, xx), out = lax.scan(body, (params, x), None, length=k)
        return out[-1]

    float(run_k(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run_k(params, x))
    xla_ms = (time.perf_counter() - t0) / (reps * k) * 1e3

    # XLA cost model of the same program (per scan iteration)
    ca = jax.jit(lambda p, xx: fwdbwd(p, xx)).lower(params, x).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_gb = float(ca.get("bytes accessed", 0.0)) / 1e9
    flops_cost_model = float(ca.get("flops", 0.0)) / 1e12

    # --- B: the fused-kernel lower bound ---
    n, hw = n_images, size * size
    x_b = n * hw * 3 * BF16
    out_b = n * (hw // 4) * 64 * BF16
    # fwd reads x + writes out; bwd re-reads x (recompute), reads the
    # cotangent g, writes dx. Weight grads (2x 3x3x64x64 f32) are noise.
    traffic = (2 * x_b) + out_b + out_b + x_b
    conv0_fl = 2 * n * hw * 9 * 3 * 64
    conv1_fl = 2 * n * hw * 9 * 64 * 64
    fwd_fl = conv0_fl + conv1_fl
    fused_fl = 4 * fwd_fl  # fwd + in-kernel recompute + dgrad + wgrad
    dma_ms = traffic / (PALLAS_DMA_GB_S * 1e9) * 1e3
    gemm_ms = fused_fl / (PALLAS_GEMM_TFLOPS * 1e12) * 1e3
    pallas_lb_ms = dma_ms + gemm_ms  # measured: DMA and MXU serialize

    prize_ms = xla_ms - pallas_lb_ms
    rec = {
        "metric": "vgg_stem_fwdbwd_ab",
        "mode": mode,
        "n_images": n_images,
        "xla_fwdbwd_ms" if mode != "kernel" else "fused_fwdbwd_ms":
            round(xla_ms, 2),
        "xla_cost_model_gb": round(xla_gb, 3),
        "xla_cost_model_tflop": round(flops_cost_model, 3),
        "pallas_fused_lower_bound_ms": round(pallas_lb_ms, 2),
        "pallas_lb_dma_ms": round(dma_ms, 2),
        "pallas_lb_gemm_ms": round(gemm_ms, 2),
        "pallas_lb_traffic_gb": round(traffic / 1e9, 3),
        "pallas_lb_tflop": round(fused_fl / 1e12, 3),
        "prize_ms": round(prize_ms, 2),
        "verdict": ("fusion can win; build it" if prize_ms > 2.0
                    else "prize unavailable: serial DMA+MXU bound >= XLA"),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--mode", choices=["full", "dx", "kernel"], default="full",
                   help="full = wrt params+x (r4 protocol); dx = wrt x only "
                        "(the frozen-VGG step's real cost); kernel = the "
                        "fused Pallas dx path")
    args = p.parse_args()
    main(args.n_images, args.size, args.k, mode=args.mode)
