"""Training configs — one small dataclass per task (SURVEY.md section 5:
the reference hard-codes hyperparameters in scripts/notebooks; here they
live in a single typed config, no framework)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

from text_segmentation_image_inpainting_tpu.losses.inpainting import InpaintLossConfig


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    # 'adam' (default; amsgrad flag upgrades it) | 'sgd' (plain, with
    # beta1 as momentum). SGD matters for exactness tests and staged
    # fine-tunes: the Adam update lr*m/(sqrt(v)+eps) amplifies ulp-level
    # gradient reassociation differences up to ~2*lr on near-zero grads,
    # so bitwise-style comparisons of accumulated-vs-bigbatch steps are
    # only meaningful under SGD.
    kind: str = "adam"
    learning_rate: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.999
    weight_decay: float = 0.0
    amsgrad: bool = False  # README mentions AMSGrad experiments (SURVEY.md C11)
    grad_clip_norm: float | None = None
    warmup_steps: int = 0
    # cosine warm-restart period (0 = constant LR); reference README
    # mentions LR warm-restart scheduling [R-low]
    restart_period: int = 0
    # number of warm-restart cycles; schedule holds end_value after the
    # last cycle (size it to cover the planned step budget)
    restart_cycles: int = 50


@dataclasses.dataclass(frozen=True)
class SegTrainConfig:
    image_size: Tuple[int, int] = (512, 512)
    batch_size: int = 8
    width_mult: float = 1.0
    output_stride: int = 8
    decoder_mid: int = 128  # decoder trunk width (mini-ASPP; >=256 for deeplab)
    backbone: str = "mobilenet_v2"  # or "xception" (alternative-encoder track)
    head: str = "mini"  # or "deeplab" (full ASPP + v3+ decoder)
    bce_weight: float = 1.0
    dice_weight: float = 1.0
    focal_weight: float = 0.0
    pos_weight: float | None = 3.0  # text pixels are rare
    freeze_encoder: bool = False  # staged training (SURVEY.md C11)
    # microbatched gradient accumulation: split each batch into
    # grad_accum microbatches, average their grads, apply ONE optimizer
    # update (use with remat/'big' effective batches on tight HBM);
    # BN uses per-microbatch statistics — standard accumulation semantics
    grad_accum: int = 1
    optimizer: OptimizerConfig = OptimizerConfig()
    bf16_compute: bool = True
    checkpoint_every: int = 500
    log_every: int = 50


@dataclasses.dataclass(frozen=True)
class InpaintTrainConfig:
    image_size: Tuple[int, int] = (512, 512)
    batch_size: int = 8
    depth: int = 8
    # training default: bf16 VGG trunk (fp32 term accumulation inside
    # the loss) — the three full-res VGG forwards are the step's FLOPs
    # wall; parity/eval paths that need exact fp32 pass their own config
    loss: InpaintLossConfig = InpaintLossConfig(vgg_dtype="bfloat16")
    # U-Net rematerialization in the train step: 'none' (keep
    # activations; fastest, fits batch 8 x 512^2) | 'full' (recompute)
    remat: str = "none"
    # paper's phase-2 fine-tune: freeze ENCODER BN only (running-average
    # mode); decoder BN keeps training (Liu et al. 2018)
    freeze_bn: bool = False
    # experiment track: SAGAN self-attention at the U-Net bottleneck,
    # optionally spectral-normalized (power-iteration u/v state rides
    # the TrainState like BN stats)
    attention: bool = False
    attention_sn: bool = False
    # microbatched gradient accumulation (see SegTrainConfig.grad_accum)
    grad_accum: int = 1
    optimizer: OptimizerConfig = OptimizerConfig()
    bf16_compute: bool = True
    pconv_impl: str = "xla"  # 'xla' | 'pallas'
    checkpoint_every: int = 500
    log_every: int = 50
