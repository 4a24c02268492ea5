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

    def _segment2d(self, seg_variables, pages: jax.Array) -> jax.Array:
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
        text2d = dilate_mask(text2d, self.dilate_radius)
        return 1.0 - text2d  # valid = not-text

    def segment(self, seg_variables, pages: jax.Array) -> jax.Array:
        """pages (N,H,W,3) in [0,1] -> dilated binary text mask (N,H,W,1)."""
        return (1.0 - self._segment2d(seg_variables, pages))[..., None]

    def inpaint(self, unet_variables, pages: jax.Array, text_mask: jax.Array) -> jax.Array:
        """Inpaint the text region; returns the composited clean page
        (compute_dtype — cast at the consumer if fp32 is needed)."""
        valid2d = 1.0 - text_mask[..., 0].astype(self.compute_dtype)
        return self._inpaint2d(unet_variables, pages, valid2d)

    def _inpaint2d(self, unet_variables, pages: jax.Array, valid2d: jax.Array) -> jax.Array:
        valid = valid2d[..., None]  # single (N,H,W,1) materialization
        pages = pages.astype(self.compute_dtype)
        holes_zeroed = pages * valid
        out = self.unet.apply(unet_variables, holes_zeroed, valid)
        return valid * pages + (1.0 - valid) * out

    def run(self, seg_variables, unet_variables, pages: jax.Array):
        """Full fused pipeline: (clean_pages, text_mask) in compute_dtype."""
        valid2d = self._segment2d(seg_variables, pages)
        clean = self._inpaint2d(unet_variables, pages, valid2d)
        return clean, (1.0 - valid2d)[..., None]

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
