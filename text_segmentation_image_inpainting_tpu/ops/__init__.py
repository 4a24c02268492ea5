"""Pure-function compute ops (XLA + Pallas)."""

from text_segmentation_image_inpainting_tpu.ops.conv import conv2d, torch_same_padding
from text_segmentation_image_inpainting_tpu.ops.partial_conv import partial_conv2d
from text_segmentation_image_inpainting_tpu.ops.morphology import dilate_mask, binarize
from text_segmentation_image_inpainting_tpu.ops.resize import resize_bilinear, upsample_nearest

__all__ = [
    "conv2d",
    "torch_same_padding",
    "partial_conv2d",
    "dilate_mask",
    "binarize",
    "resize_bilinear",
    "upsample_nearest",
]
