from text_segmentation_image_inpainting_tpu.compat.torch_export import (
    export_inpaint_unet,
    export_mobilenetv2_encoder,
    export_text_segmenter,
    save_torch_file,
)
from text_segmentation_image_inpainting_tpu.compat.torch_import import (
    import_inpaint_unet,
    import_mobilenetv2_encoder,
    import_text_segmenter,
    import_torchvision_mobilenetv2,
    import_vgg16_features,
    tolerant_import,
)

__all__ = [
    "export_inpaint_unet",
    "export_mobilenetv2_encoder",
    "export_text_segmenter",
    "save_torch_file",
    "import_inpaint_unet",
    "import_mobilenetv2_encoder",
    "import_text_segmenter",
    "import_torchvision_mobilenetv2",
    "import_vgg16_features",
    "tolerant_import",
]
