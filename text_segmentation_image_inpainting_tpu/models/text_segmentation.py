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


class DeepLabASPPDecoder(nn.Module):
    """DeepLab-v3+-style head: full ASPP (1x1 + three dilated 3x3 branches
    + image-level pooling) over the encoder output, then the v3+ decoder
    (upsample to s4, 48-channel skip concat, two 3x3 refiners, 1-ch head).

    The reference's README-era ASPP experiment track (SURVEY.md section
    2.1 "possible extras" [R-low]) — offered as ``TextSegmenter(
    head='deeplab')``. Branch rates follow DeepLab: (12, 24, 36) at
    output-stride 8, (6, 12, 18) at 16.
    """

    mid: int = 256
    output_stride: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps, *, train: bool = False):
        out = taps["out"]
        scale = 12 if self.output_stride <= 8 else 6
        branches = [
            ConvBNAct(self.mid, 1, act="relu", dtype=self.dtype, name="aspp0")(
                out, train=train
            )
        ]
        for i, r in enumerate((scale, 2 * scale, 3 * scale)):
            branches.append(
                ConvBNAct(
                    self.mid, 3, dilation=r, act="relu", dtype=self.dtype,
                    name=f"aspp{i + 1}",
                )(out, train=train)
            )
        # image-level pooling branch (global context), broadcast back
        pooled = jnp.mean(out, axis=(1, 2), keepdims=True)
        pooled = ConvBNAct(self.mid, 1, act="relu", dtype=self.dtype, name="image_pool")(
            pooled, train=train
        )
        branches.append(jnp.broadcast_to(pooled, out.shape[:3] + (self.mid,)))
        x = ConvBNAct(self.mid, 1, act="relu", dtype=self.dtype, name="fuse")(
            jnp.concatenate(branches, axis=-1), train=train
        )

        s4 = taps["s4"]
        x = resize_bilinear(x, s4.shape[1:3])
        skip4 = ConvBNAct(48, 1, act="relu", dtype=self.dtype, name="skip4")(
            s4, train=train
        )
        x = jnp.concatenate([x, skip4], axis=-1)
        x = ConvBNAct(self.mid, 3, act="relu", dtype=self.dtype, name="dec0")(
            x, train=train
        )
        x = ConvBNAct(self.mid, 3, act="relu", dtype=self.dtype, name="dec1")(
            x, train=train
        )
        # 1x1 head before the x4 upsample (linear ops commute; resizing
        # 1 channel instead of mid cuts full-res traffic — same trick as
        # DilatedDecoder, profiled in round 1)
        x = nn.Conv(
            1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="head"
        )(x)
        return resize_bilinear(x, (s4.shape[1] * 4, s4.shape[2] * 4))


class TextSegmenter(nn.Module):
    """img (N,H,W,3) -> text-mask logits (N,H,W,1).

    ``backbone``: 'mobilenet_v2' (reference default) or 'xception' (the
    reference's alternative-encoder experiment track). ``head``: 'mini'
    (reference's dilated decoder) or 'deeplab' (full ASPP + v3+ decoder).
    """

    width_mult: float = 1.0
    output_stride: int = 8
    decoder_mid: int = 128
    backbone: str = "mobilenet_v2"
    head: str = "mini"
    # xception backbone only: middle-flow residual block count (the
    # standard Xception-65 uses 8 repeats at OS16 geometry; smaller
    # values give cheap capacity variants for tests/smoke runs)
    middle_repeats: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.backbone == "xception":
            from text_segmentation_image_inpainting_tpu.models.xception import (
                XceptionEncoder,
            )

            taps = XceptionEncoder(
                self.width_mult, self.output_stride,
                middle_repeats=self.middle_repeats, dtype=self.dtype, name="encoder"
            )(x, train=train)
        elif self.backbone == "mobilenet_v2":
            taps = MobileNetV2Encoder(
                self.width_mult, self.output_stride, dtype=self.dtype, name="encoder"
            )(x, train=train)
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        if self.head == "deeplab":
            return DeepLabASPPDecoder(
                max(self.decoder_mid, 256), self.output_stride, dtype=self.dtype,
                name="decoder",
            )(taps, train=train)
        if self.head != "mini":
            raise ValueError(f"unknown head {self.head!r}")
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
