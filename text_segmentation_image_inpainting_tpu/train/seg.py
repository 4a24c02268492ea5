"""Segmentation training step (SURVEY.md section 3.1, rebuilt SPMD).

One jit-able pure function: forward (train-mode BN, mutable batch_stats)
-> BCE/dice loss -> grad -> optax update. Batch is sharded over the
``data`` mesh axis by the caller; GSPMD handles the gradient all-reduce
and cross-device BN statistics — there is no pmap/pmean in sight.
"""

from __future__ import annotations


from typing import Dict

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.losses.segmentation import segmentation_loss
from text_segmentation_image_inpainting_tpu.train.config import SegTrainConfig
from text_segmentation_image_inpainting_tpu.train.state import TrainState


def make_seg_train_step(model, cfg: SegTrainConfig):
    """Returns ``train_step(state, batch) -> (state, metrics)``.

    batch: {'image': (N,H,W,3) float, 'mask': (N,H,W,1) {0,1}}.
    Call under jit with batch sharded over the data axis; donate
    ``state`` for in-place buffer reuse:
        step = jax.jit(make_seg_train_step(model, cfg), donate_argnums=0)
    """

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits, updates = model.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"]
        )
        loss, terms = segmentation_loss(
            logits,
            batch["mask"],
            bce_weight=cfg.bce_weight,
            dice_weight=cfg.dice_weight,
            focal_weight=cfg.focal_weight,
            pos_weight=cfg.pos_weight,
        )
        return loss, (terms, updates)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        if cfg.grad_accum > 1:
            from text_segmentation_image_inpainting_tpu.train.accum import (
                accumulate_grads,
            )

            def grad_fn(params, aux, mb):
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    params, aux["batch_stats"], mb
                )

            grads, terms, updates = accumulate_grads(
                grad_fn,
                state.params,
                {"batch_stats": state.batch_stats},
                batch,
                cfg.grad_accum,
            )
        else:
            (_, (terms, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch
            )
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])
        metrics = {k: v for k, v in terms.items()}
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        )
        return state, metrics

    return train_step


def make_seg_eval_step(model, *, threshold: float = 0.5):
    """eval_step(state, batch) -> per-batch IoU/precision/recall."""

    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, batch["image"])
        pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold).astype(jnp.float32)
        gt = batch["mask"].astype(jnp.float32)
        tp = jnp.sum(pred * gt)
        fp = jnp.sum(pred * (1 - gt))
        fn = jnp.sum((1 - pred) * gt)
        eps = 1e-6
        return {
            "iou": tp / (tp + fp + fn + eps),
            "precision": tp / (tp + fp + eps),
            "recall": tp / (tp + fn + eps),
        }

    return eval_step
