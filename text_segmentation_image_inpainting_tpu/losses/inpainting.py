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

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.models.vgg import (
    VGG16Features,
    apply_vgg_features,
)
from text_segmentation_image_inpainting_tpu.ops.morphology import dilate_mask


def _at_least_f32(x):
    """Promote bf16/f16 inputs to f32 but PRESERVE f64 (x64 exactness tests)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


@dataclasses.dataclass(frozen=True)
class InpaintLossConfig:
    valid: float = 1.0
    hole: float = 6.0
    perceptual: float = 0.05
    style: float = 120.0
    tv: float = 0.1
    vgg_taps: int = 3
    vgg_normalize: bool = True
    # VGG trunk compute dtype. 'bfloat16' runs the three 512^2 VGG
    # forwards (the step's dominant FLOPs, SURVEY.md section 3.2 "2nd-
    # hottest compute") on the MXU at 2x rate; every loss TERM still
    # accumulates in fp32 (sums use dtype=f32, Grams use
    # preferred_element_type=f32), so only the conv activations round.
    vgg_dtype: str = "float32"
    # Route the VGG stem (conv0-relu-conv1-relu-pool1) through the fused
    # Pallas dx-only backward (ops/pallas/vgg_stem_bwd.py) — identical
    # forward, ~an-order-of-magnitude less HBM traffic in the stem's
    # backward. Safe because vgg_variables are frozen constants here.
    fused_stem: bool = False


def gram_matrix(feats: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C, C) Gram, normalized by C*H*W (paper's K_p).

    The flattened (HW, C) x (C, HW) contraction is a big MXU matmul —
    TPU-friendly by construction.
    """
    n, h, w, c = feats.shape
    # keep the input dtype (bf16 inputs -> bf16 MXU matmul); accumulate
    # and return fp32 via preferred_element_type
    f = feats.reshape(n, h * w, c)
    acc = jnp.promote_types(feats.dtype, jnp.float32)
    gram = jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=acc)
    return gram / float(c * h * w)


def total_variation_loss(comp: jnp.ndarray, hole_region: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic TV of ``comp`` restricted to ``hole_region`` (N,H,W,1).

    Paper: smoothness penalty on P, the 1-px dilation of the hole. A
    difference term counts when BOTH its endpoints are in P.
    """
    comp = _at_least_f32(comp)
    region = hole_region.astype(comp.dtype)
    dy = jnp.abs(comp[:, 1:] - comp[:, :-1]) * (region[:, 1:] * region[:, :-1])
    dx = jnp.abs(comp[:, :, 1:] - comp[:, :, :-1]) * (region[:, :, 1:] * region[:, :, :-1])
    denom = jnp.maximum(jnp.sum(region), 1.0) * comp.shape[-1]
    return (jnp.sum(dy) + jnp.sum(dx)) / denom


def _masked_l1(a, b, m, *, normalize_by_mask: bool) -> jnp.ndarray:
    diff = jnp.abs(_at_least_f32(a) - _at_least_f32(b)) * m
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
        vgg_model = VGG16Features(
            num_taps=config.vgg_taps,
            normalize=config.vgg_normalize,
            dtype=jnp.dtype(config.vgg_dtype),
        )
    mask = mask.astype(jnp.promote_types(jnp.result_type(out, mask), jnp.float32))
    hole = 1.0 - mask
    comp = mask * gt + hole * out

    terms: Dict[str, jnp.ndarray] = {}
    terms["valid"] = _masked_l1(out, gt, mask, normalize_by_mask=True)
    terms["hole"] = _masked_l1(out, gt, hole, normalize_by_mask=True)

    # ONE batched VGG forward for the two differentiated images: 2N-batch
    # GEMMs keep the MXU fuller and halve kernel count vs two N-batch
    # applies (same math — VGG has no cross-batch ops; BN-free trunk)
    n = out.shape[0]
    feats_oc = apply_vgg_features(
        vgg_model, vgg_variables, jnp.concatenate([out, comp], axis=0),
        fused_stem=config.fused_stem,
    )
    feats_out = [f[:n] for f in feats_oc]
    feats_comp = [f[n:] for f in feats_oc]
    # gt is a constant w.r.t. the generator: no cotangent ever flows
    # through this branch. Keeping it a SEPARATE stop_gradient'd forward
    # (not concatenated) lets XLA skip both its residual saving and its
    # (dead) backward — the step pays 2 differentiated VGG forwards, not 3.
    feats_gt = jax.lax.stop_gradient(vgg_model.apply(vgg_variables, gt))

    perc = 0.0
    style_out = 0.0
    style_comp = 0.0
    for fo, fc, fg in zip(feats_out, feats_comp, feats_gt):
        denom = float(fg.size)
        # abs-diffs in the tap dtype (bf16 under vgg_dtype='bfloat16'),
        # reductions accumulate fp32 (f64 under x64)
        acc = jnp.promote_types(fo.dtype, jnp.float32)
        perc += jnp.sum(jnp.abs(fo - fg), dtype=acc) / denom
        perc += jnp.sum(jnp.abs(fc - fg), dtype=acc) / denom
        g_gt = gram_matrix(fg)  # fp32 out (preferred_element_type)
        style_out += jnp.mean(jnp.abs(gram_matrix(fo) - g_gt))
        style_comp += jnp.mean(jnp.abs(gram_matrix(fc) - g_gt))
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
