"""Partial convolution (Liu et al. 2018, arXiv:1804.07723) — functional op.

Semantics (paper eq. 1-2): for each output window,

    y = W^T (X . M) * sum(1) / sum(M) + b     if sum(M) > 0
    y = 0                                      otherwise
    M' = 1[sum(M) > 0]

The reference repo emulates this with TWO stock ``nn.Conv2d`` calls — a
trainable feature conv over ``X*M`` plus a frozen all-ones conv computing
``sum(M)`` per window (SURVEY.md C5). Here the canonical implementation
is a single fused Pallas TPU kernel (``ops/pallas/partial_conv_kernel.py``)
that does masked conv, ``1/sum(M)`` renormalization and binary mask update
in one pass; the XLA implementation below is the always-correct fallback
and the autodiff path.

Mask representation (TPU-first design choice): masks are carried as
(N, H, W, G) with ``G`` *mask groups*, each group covering a contiguous
block of feature channels of static size ``group_sizes[g]``. The common
case is G=1 (one mask broadcast over all channels — exactly the
reference's hole mask). The U-Net decoder's skip concatenation produces
G=2 (decoder-stream mask + encoder-skip mask). This is mathematically
identical to the paper's per-channel masks whenever channels within a
group share a mask (always true here), but moves O(C) mask bandwidth down
to O(G).

With grouped masks the window normalizer is

    sum(M) = sum_g group_sizes[g] * window_sum(M_g)
    sum(1) = kh * kw * sum_g group_sizes[g] = kh * kw * Cin

computed by ONE tiny conv of the G-channel mask with a per-group-weighted
ones kernel.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from text_segmentation_image_inpainting_tpu.ops.conv import IntOrPair, _pair


def mask_window_sum(
    mask: jax.Array,
    group_sizes: Sequence[int],
    kernel_size: Tuple[int, int],
    *,
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    dilation: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """sum(M) per output window, weighted by channel-group sizes.

    mask: (N, H, W, G) in {0, 1}. Returns (N, H', W', 1) float32.
    """
    kh, kw = kernel_size
    g = mask.shape[-1]
    assert len(group_sizes) == g, (group_sizes, mask.shape)
    w = jnp.ones((kh, kw, g, 1), jnp.float32) * jnp.asarray(
        group_sizes, jnp.float32
    ).reshape(1, 1, g, 1)
    return lax.conv_general_dilated(
        mask.astype(jnp.float32),
        w,
        window_strides=stride,
        padding=(
            (padding[0], padding[0]),
            (padding[1], padding[1]),
        ),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def broadcast_mask(mask: jax.Array, group_sizes: Sequence[int]) -> jax.Array:
    """Expand (N,H,W,G) grouped mask to per-channel (N,H,W,sum(group_sizes))."""
    parts = [
        jnp.broadcast_to(mask[..., g : g + 1], mask.shape[:-1] + (size,))
        for g, size in enumerate(group_sizes)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def apply_mask(x: jax.Array, mask: jax.Array, group_sizes: Sequence[int]) -> jax.Array:
    """x * broadcast_mask(mask) without materializing the broadcast.

    Each channel-group slice multiplies its own 1-channel mask — XLA
    fuses the rank-broadcast into the multiply, where an explicit
    ``broadcast_to``+concat writes a full feature-map-sized mask to HBM
    first (measured ~14 ms/batch of pure broadcast traffic at 512^2).
    """
    if len(group_sizes) == 1:
        return x * mask
    parts = []
    off = 0
    for gi, size in enumerate(group_sizes):
        parts.append(x[..., off : off + size] * mask[..., gi : gi + 1])
        off += size
    return jnp.concatenate(parts, axis=-1)


def partial_conv2d(
    x: jax.Array,
    mask: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    group_sizes: Sequence[int] | None = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """Fused partial convolution.

    Args:
      x: (N, H, W, Cin) features.
      mask: (N, H, W, G) binary validity mask (1 = valid pixel).
      kernel: (kh, kw, Cin, Cout) HWIO.
      bias: optional (Cout,). NOT renormalized; zeroed in fully-masked
        windows (paper semantics; matches the reference two-conv emulation
        which subtracts/re-adds the bias around the renorm).
      group_sizes: channel count covered by each mask group; defaults to
        a single group covering all Cin channels.
      impl: 'xla' (two lax convs + fused epilogue) or 'pallas' (fused
        single-pass TPU kernel).

    Returns:
      (y, new_mask): y (N, H', W', Cout); new_mask (N, H', W', 1) in
      x.dtype, 1 where the window saw any valid pixel.
    """
    kh, kw, cin, _ = kernel.shape
    if group_sizes is None:
        group_sizes = (cin,)
    assert sum(group_sizes) == cin, (group_sizes, kernel.shape)
    assert mask.shape[-1] == len(group_sizes)
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)

    if impl == "pallas":
        from text_segmentation_image_inpainting_tpu.ops.pallas.partial_conv_kernel import (
            partial_conv2d_pallas,
        )

        # positional: custom_vjp nondiff args cannot be passed by keyword
        return partial_conv2d_pallas(
            x, mask.astype(x.dtype), kernel, bias, tuple(group_sizes), s, p, d
        )

    return _partial_conv2d_xla(x, mask, kernel, bias, tuple(group_sizes), s, p, d)


def _partial_conv2d_xla(x, mask, kernel, bias, group_sizes, stride, padding, dilation):
    kh, kw, cin, _ = kernel.shape
    masked = apply_mask(x, mask.astype(x.dtype), group_sizes)
    acc_dtype = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype
    # NOTE: no preferred_element_type here — conv with a widened output
    # dtype is not transposable under autodiff (jax 0.9), and TPU bf16
    # convs accumulate in f32 natively anyway; the epilogue runs in f32.
    feat = lax.conv_general_dilated(
        masked,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(acc_dtype)
    msum = mask_window_sum(
        mask, group_sizes, (kh, kw), stride=stride, padding=padding, dilation=dilation
    )
    window_size = float(kh * kw * cin)
    valid = msum > 0
    scale = window_size / jnp.maximum(msum, 1.0)
    out = feat * scale.astype(acc_dtype)
    if bias is not None:
        out = out + bias.astype(acc_dtype)
    # cast BEFORE the where: otherwise XLA sinks the f32->bf16 convert past
    # downstream upsamples/multiplies, doubling their HBM traffic (profiled)
    out = jnp.where(valid, out.astype(x.dtype), jnp.zeros((), x.dtype))
    new_mask = valid.astype(x.dtype)
    return out, new_mask
