"""On-device binary mask morphology.

The reference pipeline dilates the predicted text mask on the HOST
(cv2/PIL) before inpainting, forcing a device->host->device round trip
(SURVEY.md section 3.3). Here dilation is a `lax.reduce_window` max-pool
so the whole segment -> dilate -> inpaint chain stays on device
(BASELINE.json north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def binarize(prob: jax.Array, threshold: float = 0.5) -> jax.Array:
    """Probability map -> {0,1} mask (same dtype)."""
    return (prob > threshold).astype(prob.dtype)


def dilate_mask(mask: jax.Array, radius: int = 3, iterations: int = 1) -> jax.Array:
    """Binary dilation with a (2r+1)x(2r+1) square structuring element.

    mask: (N, H, W, C) in {0,1}. Equivalent to cv2.dilate with a square
    kernel. TPU layout notes: a square max-pool on an (N, H, W, 1) array
    puts the size-1 channel in the lane dim — 1/128 VPU efficiency. So
    the C=1 case squeezes to (N, H, W) (W on lanes) and the square max
    separates into a vertical + horizontal 1-D pass (exact for square
    structuring elements), turning 49 compares/pixel at 1/128 lanes into
    14 at full width.
    """
    if radius <= 0 or iterations <= 0:
        return mask
    k = 2 * radius + 1
    squeeze = mask.shape[-1] == 1
    out = mask[..., 0] if squeeze else mask

    def max1d(x, axis):
        win = [1] * x.ndim
        pad = [(0, 0)] * x.ndim
        win[axis] = k
        pad[axis] = (radius, radius)
        return lax.reduce_window(
            x, jnp.zeros((), x.dtype), lax.max,
            window_dimensions=tuple(win), window_strides=(1,) * x.ndim,
            padding=tuple(pad),
        )

    h_axis = 1
    w_axis = 2
    for _ in range(iterations):
        out = max1d(max1d(out, h_axis), w_axis)
    return out[..., None] if squeeze else out


def erode_mask(mask: jax.Array, radius: int = 1) -> jax.Array:
    """Binary erosion (min-pool), dual of `dilate_mask`."""
    if radius <= 0:
        return mask
    k = 2 * radius + 1
    return lax.reduce_window(
        mask,
        jnp.ones((), mask.dtype),
        lax.min,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius), (0, 0)),
    )
