"""Quality metrics: IoU, PSNR, SSIM — the parity-gate metrics
(BASELINE.json:2 "mask IoU; inpaint PSNR/SSIM"), implemented in JAX so
eval runs on device."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def iou(pred: jax.Array, target: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """Binary IoU over the whole batch; inputs in {0,1}."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target) - inter
    return inter / (union + eps)


def psnr(pred: jax.Array, target: jax.Array, *, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jax.Array,
    target: jax.Array,
    *,
    max_val: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM (Wang et al. 2004) with the standard 11x11 gaussian
    window, computed per channel via depthwise convs (MXU-friendly)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c = pred.shape[-1]
    win = _gaussian_kernel(kernel_size, sigma)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(x):
        # HIGHEST precision is load-bearing: the TPU's default conv
        # precision runs bf16 passes, and the sigma terms below are
        # catastrophic cancellations (E[x^2] - mu^2 ~ 1e-4 on flat page
        # regions vs c2 = 9e-4) — bf16 noise there inflated SSIM past
        # 1.0 on near-perfect reconstructions
        return lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=lax.Precision.HIGHEST,
        )

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    # variances are nonnegative by definition; clamp the cancellation
    sigma_p = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_t = jnp.maximum(filt(target * target) - mu_tt, 0.0)
    sigma_pt = filt(pred * target) - mu_pt
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)
