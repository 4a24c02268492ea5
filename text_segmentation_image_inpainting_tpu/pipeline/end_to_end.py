"""Fused segment -> mask-dilate -> inpaint page pipeline (SURVEY.md C12).

In the reference this is manual notebook glue with a host round-trip for
cv2 mask dilation (SURVEY.md section 3.3). Here the whole chain is ONE
jit-compiled XLA program: segmentation forward, sigmoid/threshold,
max-pool dilation, hole masking, partial-conv inpainting and final
compositing all stay on device — pages stream through with no host hops
(the BASELINE.json:5 north star). Batched over the ``data`` mesh axis
for multi-chip streaming.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text_segmentation_image_inpainting_tpu.models.partial_convolution import InpaintUNet
from text_segmentation_image_inpainting_tpu.models.text_segmentation import TextSegmenter
from text_segmentation_image_inpainting_tpu.ops.morphology import dilate_mask
from text_segmentation_image_inpainting_tpu.ops.resize import resize_bilinear


def preprocess_page(image: jax.Array, size: Tuple[int, int] = (512, 512)) -> jax.Array:
    """On-device resize of (N,H,W,3) uint8/float to float [0,1] at ``size``."""
    x = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        x = x / 255.0
    return resize_bilinear(x, size)


def pad_to_multiple(pages: jax.Array, multiple: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """Edge-pad (N,H,W,C) bottom/right so H,W are multiples of ``multiple``.

    Returns (padded, (H, W)) — the original spatial size for cropping the
    output back. Edge padding keeps the pad region statistically page-like
    (a constant fill would bleed into the partial convs at the border).
    Static shapes only: the pad amount is resolved at trace time.
    """
    h, w = pages.shape[1], pages.shape[2]
    hp = -(-h // multiple) * multiple
    wp = -(-w // multiple) * multiple
    if (hp, wp) == (h, w):
        return pages, (h, w)
    return (
        jnp.pad(pages, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge"),
        (h, w),
    )


@dataclasses.dataclass(frozen=True)
class TextRemovalPipeline:
    """Two-stage text removal, end-to-end on device.

    Usage:
        pipe = TextRemovalPipeline()
        fn = jax.jit(pipe.run)        # or pipe.jitted()
        clean, text_mask = fn(seg_vars, unet_vars, pages)
    """

    threshold: float = 0.5
    dilate_radius: int = 3
    # NOTE: default models must carry the compute dtype themselves — flax
    # modules cast inputs to their own `dtype`, so an fp32-default model
    # would silently promote the whole pipeline back to fp32
    seg: TextSegmenter = dataclasses.field(
        default_factory=lambda: TextSegmenter(dtype=jnp.bfloat16)
    )
    unet: InpaintUNet = dataclasses.field(
        default_factory=lambda: InpaintUNet(dtype=jnp.bfloat16)
    )
    compute_dtype: Any = jnp.bfloat16

    def _segment2d(self, seg_variables, pages: jax.Array, *, dilate: bool = True) -> jax.Array:
        """pages (N,H,W,3) in [0,1] -> dilated VALID mask (N,H,W), squeezed.

        All mask glue runs on the squeezed (N,H,W) layout — W on lanes.
        (N,H,W,1) tensors at 512^2 use 1/128 of the VPU and force layout
        copies between stages (~15 ms/batch, profiled); the channel dim
        is materialized exactly once, at the partial-conv boundary.
        sigmoid(x) > t  <=>  x > logit(t) skips the transcendental.
        """
        logits = self.seg.apply(seg_variables, pages.astype(self.compute_dtype))
        logit_t = float(np.log(self.threshold / (1.0 - self.threshold)))
        text2d = (logits[..., 0] > jnp.asarray(logit_t, logits.dtype)).astype(
            self.compute_dtype
        )
        if dilate:
            text2d = dilate_mask(text2d, self.dilate_radius)
        return 1.0 - text2d  # valid = not-text

    def segment(self, seg_variables, pages: jax.Array, *, dilate: bool = True) -> jax.Array:
        """pages (N,H,W,3) in [0,1] -> binary text mask (N,H,W,1).

        ``dilate=True`` (default) grows the mask by ``dilate_radius`` for
        the inpainting hand-off; pass ``dilate=False`` when scoring
        IoU/precision against an undilated ground-truth text mask
        (dilation systematically deflates those metrics).
        """
        pages, (h, w) = pad_to_multiple(pages, 1 << self.unet.depth)
        return (1.0 - self._segment2d(seg_variables, pages, dilate=dilate))[:, :h, :w, None]

    def inpaint(self, unet_variables, pages: jax.Array, text_mask: jax.Array) -> jax.Array:
        """Inpaint the text region; returns the composited clean page
        (compute_dtype — cast at the consumer if fp32 is needed).
        Arbitrary sizes are edge-padded to the U-Net multiple and cropped back."""
        pages, (h, w) = pad_to_multiple(pages, 1 << self.unet.depth)
        text_mask, _ = pad_to_multiple(text_mask, 1 << self.unet.depth)
        # pad region is all-valid: edge-pad replicates border values, and
        # pad_to_multiple pads the *text* mask with its edge too — force
        # the pad strip to text=0 (valid) instead
        valid2d = 1.0 - text_mask[..., 0].astype(self.compute_dtype)
        if (h, w) != pages.shape[1:3]:
            keep = jnp.zeros(pages.shape[1:3], valid2d.dtype).at[:h, :w].set(1.0)
            valid2d = jnp.maximum(valid2d, 1.0 - keep)
        return self._inpaint2d(unet_variables, pages, valid2d)[:, :h, :w]

    def _inpaint2d(self, unet_variables, pages: jax.Array, valid2d: jax.Array) -> jax.Array:
        pages = pages.astype(self.compute_dtype)
        if self.unet.fuse_up and self.unet.impl == "xla":
            # stay in space-to-depth(2) layout end-to-end: the U-Net
            # consumes/produces s2d tensors and the composite runs in
            # s2d space, so the only full-res 3-channel materialization
            # (catastrophically lane-padded on TPU: C=3 -> 128 lanes) is
            # the single depth_to_space of the final page
            from text_segmentation_image_inpainting_tpu.ops.partial_conv import (
                depth_to_space,
                s2d_apply_mask,
                space_to_depth,
            )

            n, h, w = valid2d.shape
            s2d_pages = space_to_depth(pages)
            s2d_valid = (
                valid2d.reshape(n, h // 2, 2, w // 2, 2)
                .transpose(0, 1, 3, 2, 4)
                .reshape(n, h // 2, w // 2, 4)
            )
            out_s2d = self.unet.apply(unet_variables, s2d_pages, s2d_valid, io_s2d=True)
            comp = s2d_apply_mask(s2d_pages, s2d_valid) + s2d_apply_mask(
                out_s2d, 1.0 - s2d_valid
            )
            return depth_to_space(comp)
        valid = valid2d[..., None]  # single (N,H,W,1) materialization
        holes_zeroed = pages * valid
        out = self.unet.apply(unet_variables, holes_zeroed, valid)
        return valid * pages + (1.0 - valid) * out

    def run(self, seg_variables, unet_variables, pages: jax.Array):
        """Full fused pipeline: (clean_pages, text_mask) in compute_dtype.

        Arbitrary page sizes are handled by edge-padding to the U-Net's
        ``2**depth`` multiple (which also covers the encoder's stride-32
        taps) and cropping the outputs back — all inside the one jitted
        program, shapes static per (H, W).
        """
        pages, (h, w) = pad_to_multiple(pages, 1 << self.unet.depth)
        valid2d = self._segment2d(seg_variables, pages)
        clean = self._inpaint2d(unet_variables, pages, valid2d)
        return clean[:, :h, :w], (1.0 - valid2d)[:, :h, :w, None]

    def jitted(self, donate_pages: bool = False):
        return jax.jit(self.run, donate_argnums=(2,) if donate_pages else ())

    def init_variables(self, rng: jax.Array, page_hw: Tuple[int, int] = (512, 512)):
        """Fresh variables for both stages (dev/testing convenience)."""
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, *page_hw, 3), self.compute_dtype)
        m = jnp.ones((1, *page_hw, 1), self.compute_dtype)
        seg_vars = jax.jit(self.seg.init)(k1, x)
        unet_vars = jax.jit(self.unet.init)(k2, x, m)
        return seg_vars, unet_vars
