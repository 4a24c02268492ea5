"""Flax linen model zoo (NHWC, bf16-compute ready)."""

from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
    MobileNetV2Encoder,
    InvertedResidual,
    ConvBNAct,
)
from text_segmentation_image_inpainting_tpu.models.text_segmentation import (
    TextSegmenter,
    TextSegament,
)
from text_segmentation_image_inpainting_tpu.models.partial_convolution import (
    PartialConv,
    InpaintUNet,
)
from text_segmentation_image_inpainting_tpu.models.vgg import VGG16Features

__all__ = [
    "MobileNetV2Encoder",
    "InvertedResidual",
    "ConvBNAct",
    "TextSegmenter",
    "TextSegament",
    "PartialConv",
    "InpaintUNet",
    "VGG16Features",
]
