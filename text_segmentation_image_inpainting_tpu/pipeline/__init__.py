from text_segmentation_image_inpainting_tpu.pipeline.end_to_end import (
    TextRemovalPipeline,
    preprocess_page,
)
from text_segmentation_image_inpainting_tpu.pipeline.serve import PageStreamServer

__all__ = ["TextRemovalPipeline", "preprocess_page", "PageStreamServer"]
