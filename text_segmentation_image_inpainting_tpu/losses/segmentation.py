"""Segmentation losses for the binary text mask (SURVEY.md C9).

The reference uses a BCE-with-logits-family loss with class-imbalance
handling (text pixels are rare on a manga page): weighted BCE plus
dice / focal variants. All reductions are mean over the batch; inputs
are logits (N, H, W, 1) and targets in {0,1} of the same shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _at_least_f32(x):
    """Promote bf16/f16 inputs to f32 but PRESERVE f64 (x64 exactness tests)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def bce_with_logits(logits, targets, *, pos_weight: float | None = None):
    """Numerically-stable binary cross entropy on logits.

    ``pos_weight`` scales the positive-class term like torch's
    ``BCEWithLogitsLoss(pos_weight=...)`` — the reference's
    class-imbalance knob.
    """
    logits = _at_least_f32(logits)
    targets = targets.astype(logits.dtype)
    # log-sum-exp form: max(x,0) - x*t + log(1 + exp(-|x|))
    neg_abs = -jnp.abs(logits)
    softplus = jnp.log1p(jnp.exp(neg_abs))
    if pos_weight is None:
        loss = jnp.maximum(logits, 0.0) - logits * targets + softplus
    else:
        # torch formula: -[pw*t*log(sigmoid) + (1-t)*log(1-sigmoid)]
        log_sig = jnp.minimum(logits, 0.0) - softplus  # log(sigmoid(x))
        log_one_minus = -jnp.maximum(logits, 0.0) - softplus  # log(1-sigmoid(x))
        loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)
    return jnp.mean(loss)


def dice_loss(logits, targets, *, eps: float = 1.0):
    """Soft dice: 1 - 2|P∩T| / (|P|+|T|), computed per-sample then meaned."""
    probs = jax.nn.sigmoid(_at_least_f32(logits))
    targets = targets.astype(probs.dtype)
    axes = tuple(range(1, probs.ndim))
    inter = jnp.sum(probs * targets, axes)
    denom = jnp.sum(probs, axes) + jnp.sum(targets, axes)
    return jnp.mean(1.0 - (2.0 * inter + eps) / (denom + eps))


def focal_loss(logits, targets, *, gamma: float = 2.0, alpha: float = 0.25):
    """Focal loss (Lin et al. 2017) on logits."""
    logits = _at_least_f32(logits)
    targets = targets.astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return jnp.mean(alpha_t * (1.0 - p_t) ** gamma * ce)


def segmentation_loss(
    logits,
    targets,
    *,
    bce_weight: float = 1.0,
    dice_weight: float = 1.0,
    focal_weight: float = 0.0,
    pos_weight: float | None = None,
):
    """Default reference-style combo: weighted BCE + dice (+ optional focal)."""
    total = 0.0
    terms = {}
    if bce_weight:
        terms["bce"] = bce_with_logits(logits, targets, pos_weight=pos_weight)
        total += bce_weight * terms["bce"]
    if dice_weight:
        terms["dice"] = dice_loss(logits, targets)
        total += dice_weight * terms["dice"]
    if focal_weight:
        terms["focal"] = focal_loss(logits, targets)
        total += focal_weight * terms["focal"]
    terms["total"] = total
    return total, terms
