from text_segmentation_image_inpainting_tpu.losses.segmentation import (
    bce_with_logits,
    dice_loss,
    focal_loss,
    segmentation_loss,
)
from text_segmentation_image_inpainting_tpu.losses.inpainting import (
    InpaintLossConfig,
    gram_matrix,
    inpainting_loss,
    total_variation_loss,
)

__all__ = [
    "bce_with_logits",
    "dice_loss",
    "focal_loss",
    "segmentation_loss",
    "InpaintLossConfig",
    "gram_matrix",
    "inpainting_loss",
    "total_variation_loss",
]
