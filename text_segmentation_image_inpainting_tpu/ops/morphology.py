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
    kernel; implemented as max-pool so XLA keeps it on device and fuses it
    into the surrounding pipeline.
    """
    if radius <= 0 or iterations <= 0:
        return mask
    k = 2 * radius + 1
    out = mask
    for _ in range(iterations):
        out = lax.reduce_window(
            out,
            jnp.zeros((), out.dtype),
            lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (radius, radius), (radius, radius), (0, 0)),
        )
    return out


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
