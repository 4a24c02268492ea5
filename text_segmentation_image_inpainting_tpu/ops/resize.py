"""Resize ops with PyTorch-compatible semantics (NHWC).

Bit-parity traps handled here (SURVEY.md "hard parts" #2):
  * torch ``F.interpolate(mode='bilinear', align_corners=False)`` uses
    half-pixel centers — identical to ``jax.image.resize('bilinear')``.
  * ``align_corners=True`` needs explicit corner-aligned sampling.
  * nearest upsampling by an integer factor is exact replication in both
    frameworks (torch 'nearest' floors source indices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(
    x: jax.Array, out_hw: tuple[int, int], *, align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of (N, H, W, C) to (N, out_h, out_w, C)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if not align_corners:
        # antialias=False: torch interpolate doesn't low-pass when downscaling
        return jax.image.resize(x, (n, oh, ow, c), method="bilinear", antialias=False).astype(
            x.dtype
        )
    # align_corners=True: sample positions i * (H-1)/(oh-1)
    dtype = jnp.promote_types(x.dtype, jnp.float32)

    def axis_weights(in_size: int, out_size: int):
        if out_size == 1:
            src = jnp.zeros((1,), dtype)
        else:
            src = jnp.arange(out_size, dtype=dtype) * ((in_size - 1) / (out_size - 1))
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.clip(lo + 1, 0, in_size - 1)
        frac = src - lo.astype(dtype)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h, oh)
    xlo, xhi, xf = axis_weights(w, ow)
    xf32 = x.astype(dtype)
    top = xf32[:, ylo]  # (N, oh, W, C)
    bot = xf32[:, yhi]
    rows = top * (1 - yf)[None, :, None, None] + bot * yf[None, :, None, None]
    left = rows[:, :, xlo]
    right = rows[:, :, xhi]
    out = left * (1 - xf)[None, None, :, None] + right * xf[None, None, :, None]
    return out.astype(x.dtype)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Exact integer-factor nearest upsampling of (N, H, W, C).

    Matches torch ``F.interpolate(mode='nearest', scale_factor=factor)``.
    Implemented as broadcast+reshape (pure data movement; XLA lowers it to
    a copy, no gather).
    """
    if factor == 1:
        return x
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)
