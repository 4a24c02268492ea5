"""Frozen VGG16 feature extractor for perceptual/style losses.

Rebuild of the reference's loss-side VGG wrapper (SURVEY.md C7):
torchvision-layout ``features`` trunk, tapped after pool1/pool2/pool3,
ImageNet-normalized input, eval-mode (no BN — classic VGG16), gradients
flow THROUGH it to the generator but its own weights stay frozen
(enforced by keeping them in a separate, non-optimized param collection
at train time).

No network access in this environment: weights come from the torch
importer (``compat/torch_import.py``) given a torchvision
``vgg16`` state_dict file, or random init for development — parity
tests run both frameworks on the same random weights (SURVEY.md
"hard parts" #3).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision vgg16.features layout; int = conv out-channels, 'M' = maxpool
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M")


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


# NOTE (round-3 ablation, docs/KERNEL_NOTES.md): a custom-VJP 2x2 pool
# that routes the cotangent by value-equality (no select_and_scatter)
# was tried here and REVERTED — the backward's full-res broadcasts did
# not fuse on this backend and cost MORE than the scatter they replaced
# (train-inpaint device time 95 -> 109 ms/step, broadcast_in_dim ops at
# 2.6 ms each in the profile). The stock lowering stays.
def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def apply_vgg_features(
    model: "VGG16Features",
    variables,
    x: jnp.ndarray,
    *,
    fused_stem: bool = False,
    stem_interpret: bool = False,
):
    """``model.apply(variables, x)`` with an optional fused stem.

    With ``fused_stem=True`` the first five ops (conv0-relu-conv1-relu-
    pool1 — the step's memory-bound hot spot) run through
    ``ops.pallas.vgg_stem_bwd.vgg_stem_frozen``: identical forward, but
    the backward is the single fused Pallas dx kernel instead of XLA's
    ~20 GB-of-HBM-traffic autodiff (docs/KERNEL_NOTES.md round 5).
    FROZEN CONTRACT: VGG weights get zero cotangents — exactly how every
    loss in this repo treats them (losses/inpainting.py vgg_variables).

    Falls back to the stock path when the geometry doesn't fit the
    kernel (H odd, W not a multiple of 16). Output matches
    ``model.apply`` bit-for-bit in the forward either way.
    """
    if not fused_stem:
        return model.apply(variables, x)
    h, w = x.shape[1], x.shape[2]
    if h % 16 or w % 16:  # bwd kernel: H/2 divisible by 8, W by 16
        return model.apply(variables, x)

    from text_segmentation_image_inpainting_tpu.ops.pallas.vgg_stem_bwd import (
        vgg_stem_frozen,
    )

    p = variables["params"]
    dtype = jnp.dtype(model.dtype)
    if model.normalize:
        x = imagenet_normalize(x)
    y = vgg_stem_frozen(
        x,
        p["conv0"]["kernel"],
        p["conv0"]["bias"],
        p["conv1"]["kernel"],
        p["conv1"]["bias"],
        dtype,
        stem_interpret,
    )
    taps = [y]
    if model.num_taps <= 1:
        return taps
    # remaining trunk: manual replication of the nn.Conv/relu/max_pool
    # sequence (bit-parity tested vs model.apply in tests/test_vgg_stem_bwd)
    conv_idx, pools = 2, 1
    for v in VGG16_CFG[3:]:
        if v == "M":
            y = _max_pool_2x2(y)
            pools += 1
            taps.append(y)
            if pools >= model.num_taps:
                break
        else:
            k = p[f"conv{conv_idx}"]["kernel"].astype(dtype)
            b = p[f"conv{conv_idx}"]["bias"].astype(dtype)
            y = jax.lax.conv_general_dilated(
                y.astype(dtype), k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            y = nn.relu(y)
            conv_idx += 1
    return taps


class VGG16Features(nn.Module):
    """(N,H,W,3) in [0,1] -> [pool1, pool2, pool3] feature taps."""

    num_taps: int = 3
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        if self.normalize:
            x = imagenet_normalize(x)
        taps = []
        conv_idx = 0
        pools = 0
        for v in VGG16_CFG:
            if v == "M":
                x = _max_pool_2x2(x)
                pools += 1
                taps.append(x)
                if pools >= self.num_taps:
                    break
            else:
                x = nn.Conv(
                    v, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        return taps
