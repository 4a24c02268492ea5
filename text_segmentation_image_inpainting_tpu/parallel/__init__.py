from text_segmentation_image_inpainting_tpu.parallel.mesh import (
    batch_sharding,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    make_mesh_for_batch,
    replicated,
    shard_batch,
    stacked_batch_sharding,
)
from text_segmentation_image_inpainting_tpu.parallel.stage_pipeline import (
    make_stage_mesh,
    pipeline2_run,
)

__all__ = [
    "initialize_distributed",
    "make_hybrid_mesh",
    "make_mesh",
    "make_mesh_for_batch",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "stacked_batch_sharding",
    "make_stage_mesh",
    "pipeline2_run",
]
