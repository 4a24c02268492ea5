"""TPU-native text segmentation + image inpainting framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference two-stage manga text-removal pipeline
(yu45020/Text_Segmentation_Image_Inpainting): a MobileNetV2-style
text-segmentation encoder-decoder and a partial-convolution inpainting
U-Net, fused into a single on-device segment -> mask-dilate -> inpaint
page pipeline, data-parallel over a `jax.sharding.Mesh`.

Layout (see SURVEY.md section 7):
  ops/       pure-function compute ops (torch-compatible conv semantics,
             partial convolution XLA impl + fused Pallas kernel, resize,
             mask morphology)
  models/    flax linen modules: MobileNetV2 encoder, TextSegmenter,
             PartialConv / InpaintUNet, VGG16 feature extractor
  losses/    segmentation (BCE/dice/focal) and inpainting
             (L1 hole/valid, perceptual, style/Gram, TV) loss suites
  data/      synthetic text-overlay + irregular-hole-mask generation,
             grain input pipelines
  parallel/  device mesh + sharding helpers (DP over ICI)
  pipeline/  fused end-to-end inference
  train/     train steps, config, Orbax checkpointing, metrics
  compat/    torch state_dict -> flax params importer (tolerant merge)
"""

__version__ = "0.1.0"
