from text_segmentation_image_inpainting_tpu.train.config import (
    InpaintTrainConfig,
    OptimizerConfig,
    SegTrainConfig,
)
from text_segmentation_image_inpainting_tpu.train.state import TrainState, create_train_state
from text_segmentation_image_inpainting_tpu.train.seg import make_seg_train_step
from text_segmentation_image_inpainting_tpu.train.inpaint import make_inpaint_train_step
from text_segmentation_image_inpainting_tpu.train.multistep import (
    make_multi_step,
    stack_host_batches,
)

__all__ = [
    "OptimizerConfig",
    "SegTrainConfig",
    "InpaintTrainConfig",
    "TrainState",
    "create_train_state",
    "make_seg_train_step",
    "make_inpaint_train_step",
    "make_multi_step",
    "stack_host_batches",
]
