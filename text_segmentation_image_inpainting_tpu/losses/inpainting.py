"""Inpainting loss suite (Liu et al. 2018 section 4 / SURVEY.md C8).

    L_total = w_valid*L_valid + w_hole*L_hole + w_perc*L_perc
            + w_style*(L_style_out + L_style_comp) + w_tv*L_tv

with the paper-default weights (1, 6, 0.05, 120, 0.1). ``I_comp`` is the
composed image ``M*I_gt + (1-M)*I_out``; perceptual and style terms are
evaluated on both ``I_out`` and ``I_comp`` through frozen VGG16 pool1-3
features; style uses Gram matrices; TV runs over the 1-px-dilated hole
region of ``I_comp``.

Everything is one jit-able function of (out, gt, mask, vgg_variables),
so XLA fuses the whole bundle with the backward pass.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.models.vgg import VGG16Features
from text_segmentation_image_inpainting_tpu.ops.morphology import dilate_mask


@dataclasses.dataclass(frozen=True)
class InpaintLossConfig:
    valid: float = 1.0
    hole: float = 6.0
    perceptual: float = 0.05
    style: float = 120.0
    tv: float = 0.1
    vgg_taps: int = 3
    vgg_normalize: bool = True


def gram_matrix(feats: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C, C) Gram, normalized by C*H*W (paper's K_p).

    The flattened (HW, C) x (C, HW) contraction is a big MXU matmul —
    TPU-friendly by construction.
    """
    n, h, w, c = feats.shape
    f = feats.reshape(n, h * w, c).astype(jnp.float32)
    gram = jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=jnp.float32)
    return gram / float(c * h * w)


def total_variation_loss(comp: jnp.ndarray, hole_region: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic TV of ``comp`` restricted to ``hole_region`` (N,H,W,1).

    Paper: smoothness penalty on P, the 1-px dilation of the hole. A
    difference term counts when BOTH its endpoints are in P.
    """
    comp = comp.astype(jnp.float32)
    region = hole_region.astype(jnp.float32)
    dy = jnp.abs(comp[:, 1:] - comp[:, :-1]) * (region[:, 1:] * region[:, :-1])
    dx = jnp.abs(comp[:, :, 1:] - comp[:, :, :-1]) * (region[:, :, 1:] * region[:, :, :-1])
    denom = jnp.maximum(jnp.sum(region), 1.0) * comp.shape[-1]
    return (jnp.sum(dy) + jnp.sum(dx)) / denom


def _masked_l1(a, b, m, *, normalize_by_mask: bool) -> jnp.ndarray:
    diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)) * m
    if normalize_by_mask:
        return jnp.sum(diff) / (jnp.maximum(jnp.sum(m), 1.0) * a.shape[-1])
    return jnp.mean(diff)


def inpainting_loss(
    out: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    vgg_variables: Any,
    *,
    config: InpaintLossConfig = InpaintLossConfig(),
    vgg_model: VGG16Features | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full paper loss.

    Args:
      out: (N,H,W,3) network output.
      gt: (N,H,W,3) ground truth.
      mask: (N,H,W,1), 1 = valid, 0 = hole.
      vgg_variables: frozen VGG16Features variables (not differentiated —
        callers treat them as constants; gradients flow through the
        activations to ``out`` only).
    """
    if vgg_model is None:
        vgg_model = VGG16Features(num_taps=config.vgg_taps, normalize=config.vgg_normalize)
    mask = mask.astype(jnp.float32)
    hole = 1.0 - mask
    comp = mask * gt + hole * out

    terms: Dict[str, jnp.ndarray] = {}
    terms["valid"] = _masked_l1(out, gt, mask, normalize_by_mask=True)
    terms["hole"] = _masked_l1(out, gt, hole, normalize_by_mask=True)

    feats_out = vgg_model.apply(vgg_variables, out)
    feats_comp = vgg_model.apply(vgg_variables, comp)
    feats_gt = vgg_model.apply(vgg_variables, gt)

    perc = 0.0
    style_out = 0.0
    style_comp = 0.0
    for fo, fc, fg in zip(feats_out, feats_comp, feats_gt):
        fo32, fc32, fg32 = (f.astype(jnp.float32) for f in (fo, fc, fg))
        denom = float(fg32.size)
        perc += jnp.sum(jnp.abs(fo32 - fg32)) / denom
        perc += jnp.sum(jnp.abs(fc32 - fg32)) / denom
        g_gt = gram_matrix(fg32)
        style_out += jnp.mean(jnp.abs(gram_matrix(fo32) - g_gt))
        style_comp += jnp.mean(jnp.abs(gram_matrix(fc32) - g_gt))
    terms["perceptual"] = perc
    terms["style_out"] = style_out
    terms["style_comp"] = style_comp

    tv_region = dilate_mask(hole, radius=1)
    terms["tv"] = total_variation_loss(comp, tv_region)

    total = (
        config.valid * terms["valid"]
        + config.hole * terms["hole"]
        + config.perceptual * terms["perceptual"]
        + config.style * (terms["style_out"] + terms["style_comp"])
        + config.tv * terms["tv"]
    )
    terms["total"] = total
    return total, terms
