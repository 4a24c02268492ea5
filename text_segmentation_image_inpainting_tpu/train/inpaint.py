"""Inpainting training step (SURVEY.md section 3.2, rebuilt SPMD).

Forward through the partial-conv U-Net, full Liu-2018 loss bundle
(VGG16 perceptual/style included — the VGG variables ride along as
frozen constants, never differentiated), grad, optax update. The whole
step, VGG included, is one XLA program; ``jax.checkpoint`` on the U-Net
apply keeps peak HBM in check at batch 8 x 512^2.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.losses.inpainting import inpainting_loss
from text_segmentation_image_inpainting_tpu.models.vgg import VGG16Features
from text_segmentation_image_inpainting_tpu.train.config import InpaintTrainConfig
from text_segmentation_image_inpainting_tpu.train.state import TrainState


def make_inpaint_train_step(model, cfg: InpaintTrainConfig, vgg_variables: Any):
    """Returns ``train_step(state, batch) -> (state, metrics)``.

    batch: {'image': (N,H,W,3) ground truth in [0,1],
            'mask':  (N,H,W,1) validity mask, 1 = keep, 0 = hole}.
    """
    vgg_model = VGG16Features(
        num_taps=cfg.loss.vgg_taps,
        normalize=cfg.loss.vgg_normalize,
        dtype=jnp.dtype(cfg.loss.vgg_dtype),
    )

    def loss_fn(params, batch_stats, spectral, batch):
        gt = batch["image"]
        mask = batch["mask"]
        holes_zeroed = gt * mask
        variables = {"params": params}
        mutable = ["batch_stats"]
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if spectral is not None:
            # spectral-norm u/v buffers (attention_sn experiment track):
            # power-iterated on training forwards, carried like BN stats
            variables["spectral"] = spectral
            mutable.append("spectral")

        def fwd(v, x, m):
            # cfg.freeze_bn = Liu et al. phase-2: ONLY encoder BN frozen
            # (running-average mode); decoder BN keeps training
            return model.apply(
                v, x, m, train=True, freeze_enc_bn=cfg.freeze_bn,
                mutable=mutable,
            )

        # cfg.remat: 'none' keeps every U-Net activation for the
        # backward — batch 8 x 512^2 bf16 fits v5e HBM comfortably and
        # skips a full forward recompute (measured round 3, see
        # docs/KERNEL_NOTES.md); 'full' is the old recompute-everything
        # policy for memory-tight configs (bigger batches/pages).
        if cfg.remat == "full":
            fwd_maybe_remat = jax.checkpoint(fwd)
        elif cfg.remat == "none":
            fwd_maybe_remat = fwd
        else:
            raise ValueError(f"InpaintTrainConfig.remat must be 'none'|'full', got {cfg.remat!r}")
        out, updates = fwd_maybe_remat(variables, holes_zeroed, mask)
        # out stays in the model's compute dtype (bf16): upcasting here
        # adds no information (it was produced in bf16) and costs a
        # full-res convert in fwd AND bwd; the loss accumulates fp32
        loss, terms = inpainting_loss(
            out, gt, mask, vgg_variables,
            config=cfg.loss, vgg_model=vgg_model,
        )
        return loss, (terms, updates)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if cfg.grad_accum > 1:
            from text_segmentation_image_inpainting_tpu.train.accum import (
                accumulate_grads,
            )

            def grad_fn(params, aux, mb):
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    params, aux["batch_stats"], aux["spectral"], mb
                )

            grads, terms, updates = accumulate_grads(
                grad_fn,
                state.params,
                {"batch_stats": state.batch_stats, "spectral": state.spectral},
                batch,
                cfg.grad_accum,
            )
        else:
            (_, (terms, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, state.spectral, batch
            )
        state = state.apply_gradients(grads=grads)
        # decoder BN stats still update under freeze_bn (encoder stats
        # are untouched by flax when use_running_average=True)
        if updates.get("batch_stats") is not None:
            state = state.replace(batch_stats=updates["batch_stats"])
        if updates.get("spectral") is not None:
            state = state.replace(spectral=updates["spectral"])
        return state, terms

    return train_step


def make_inpaint_eval_step(model):
    """eval_step(state, batch) -> PSNR/L1 on the composited output."""
    from text_segmentation_image_inpainting_tpu.train.metrics import psnr, ssim

    def eval_step(state: TrainState, batch):
        gt = batch["image"]
        mask = batch["mask"]
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        if getattr(state, "spectral", None) is not None:
            variables["spectral"] = state.spectral
        out = model.apply(variables, gt * mask, mask)
        comp = mask * gt + (1 - mask) * out.astype(jnp.float32)
        return {
            "psnr": psnr(comp, gt),
            "ssim": ssim(comp, gt),
            "l1": jnp.mean(jnp.abs(comp - gt)),
        }

    return eval_step
