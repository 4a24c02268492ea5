"""Text-segmentation model — MobileNetV2 encoder + dilated-conv decoder.

TPU-native rebuild of the reference's ``models/text_segmentation.py``
``TextSegament`` class (SURVEY.md C4): depthwise-separable MobileNetV2
encoder taps multi-scale features; a dilated-conv decoder (mini-ASPP at
rates 1/2/4) fuses them with bilinear upsampling and U-Net-style skip
concats down to a 1-channel logit head. ``sigmoid(logits) > tau`` is the
binary text mask.

Everything is shape-static and traces to a single XLA computation;
bilinear upsamples use half-pixel (torch ``align_corners=False``)
sampling for oracle parity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
    ConvBNAct,
    MobileNetV2Encoder,
)
from text_segmentation_image_inpainting_tpu.ops.resize import resize_bilinear


class DilatedDecoder(nn.Module):
    """Dilated-conv decoder + bilinear upsample + skip concat."""

    mid: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps, *, train: bool = False):
        branches = [
            ConvBNAct(self.mid, 3, dilation=d, act="leaky", dtype=self.dtype, name=f"aspp{i}")(
                taps["out"], train=train
            )
            for i, d in enumerate((1, 2, 4))
        ]
        x = jnp.concatenate(branches, axis=-1)
        x = ConvBNAct(self.mid, 1, act="leaky", dtype=self.dtype, name="fuse")(x, train=train)

        s4 = taps["s4"]
        x = resize_bilinear(x, s4.shape[1:3])
        skip4 = ConvBNAct(48, 1, act="leaky", dtype=self.dtype, name="skip4")(s4, train=train)
        x = ConvBNAct(self.mid // 2, 3, act="leaky", dtype=self.dtype, name="dec4")(
            jnp.concatenate([x, skip4], axis=-1), train=train
        )

        s2 = taps["s2"]
        x = resize_bilinear(x, s2.shape[1:3])
        skip2 = ConvBNAct(24, 1, act="leaky", dtype=self.dtype, name="skip2")(s2, train=train)
        x = ConvBNAct(self.mid // 4, 3, act="leaky", dtype=self.dtype, name="dec2")(
            jnp.concatenate([x, skip2], axis=-1), train=train
        )

        # the 1x1 head commutes with bilinear resize exactly (both linear;
        # bilinear weights sum to 1 so the bias passes through unchanged) —
        # applying it BEFORE the final x2 upsample resizes 1 channel
        # instead of mid//4, cutting the full-res traffic ~32x (profiled
        # ~4 ms/batch at 512^2 in round 1)
        x = nn.Conv(
            1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="head"
        )(x)
        return resize_bilinear(x, (s2.shape[1] * 2, s2.shape[2] * 2))


class TextSegmenter(nn.Module):
    """img (N,H,W,3) -> text-mask logits (N,H,W,1)."""

    width_mult: float = 1.0
    output_stride: int = 8
    decoder_mid: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        taps = MobileNetV2Encoder(
            self.width_mult, self.output_stride, dtype=self.dtype, name="encoder"
        )(x, train=train)
        return DilatedDecoder(self.decoder_mid, dtype=self.dtype, name="decoder")(
            taps, train=train
        )

    def predict_mask(self, variables, x, *, threshold: float = 0.5):
        """Convenience: logits -> probability -> binary mask, fully on device."""
        logits = self.apply(variables, x)
        prob = jax.nn.sigmoid(logits)
        return (prob > threshold).astype(x.dtype)


# The reference spells its public class "TextSegament" (upstream's own
# spelling, SURVEY.md C4) — keep an alias so reference users find it.
TextSegament = TextSegmenter
