"""Flax linen model zoo (NHWC, bf16-compute ready)."""

from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import (
    MobileNetV2Encoder,
    InvertedResidual,
    ConvBNAct,
)
from text_segmentation_image_inpainting_tpu.models.text_segmentation import (
    DeepLabASPPDecoder,
    TextSegmenter,
    TextSegament,
)
from text_segmentation_image_inpainting_tpu.models.xception import XceptionEncoder
from text_segmentation_image_inpainting_tpu.models.experiments import (
    SelfAttention2d,
    SpectralNormConv2d,
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
    "XceptionEncoder",
    "DeepLabASPPDecoder",
    "SelfAttention2d",
    "SpectralNormConv2d",
    "PartialConv",
    "InpaintUNet",
    "VGG16Features",
]
