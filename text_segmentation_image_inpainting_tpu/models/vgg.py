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
