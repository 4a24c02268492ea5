"""TrainState + optimizer assembly.

Params and optimizer state are fp32 and replicated over the mesh; model
compute runs in bf16 (flax ``dtype``). Gradients are computed on the
global (sharded) batch, so GSPMD inserts the ICI all-reduce — the
framework contains no explicit collective calls for DP.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax.training import train_state

from text_segmentation_image_inpainting_tpu.train.config import OptimizerConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    # spectral-norm power-iteration state (u/v buffers) — present only
    # when the model uses the experiments track's SpectralNormConv2d
    # (InpaintUNet(attention_sn=True)); None otherwise
    spectral: Any = None


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    if cfg.restart_period > 0:
        lr = optax.sgdr_schedule(
            [
                dict(
                    init_value=0.0 if cfg.warmup_steps else cfg.learning_rate,
                    peak_value=cfg.learning_rate,
                    warmup_steps=cfg.warmup_steps,
                    decay_steps=cfg.restart_period,
                    end_value=cfg.learning_rate * 0.01,
                )
            ]
            * cfg.restart_cycles
        )
    elif cfg.warmup_steps > 0:
        lr = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    else:
        lr = cfg.learning_rate
    if cfg.kind == "sgd":
        opt = optax.sgd(lr, momentum=cfg.beta1 or None)
        if cfg.weight_decay:
            opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay), opt)
    elif cfg.kind != "adam":
        raise ValueError(f"unknown optimizer kind {cfg.kind!r} (adam|sgd)")
    elif cfg.amsgrad:
        if cfg.weight_decay:
            # decoupled (AdamW-style) decay, SAME semantics as the
            # adamw branch below: decay is added AFTER the moment
            # rescaling, so flipping amsgrad changes only the moment
            # rule, not the regularizer (add_decayed_weights BEFORE
            # amsgrad would be classic L2 folded into the moments)
            opt = optax.chain(
                optax.scale_by_amsgrad(b1=cfg.beta1, b2=cfg.beta2),
                optax.add_decayed_weights(cfg.weight_decay),
                optax.scale_by_learning_rate(lr),
            )
        else:
            opt = optax.amsgrad(lr, b1=cfg.beta1, b2=cfg.beta2)
    elif cfg.weight_decay:
        opt = optax.adamw(lr, b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay)
    else:
        opt = optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2)
    if cfg.grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    return opt


def create_train_state(
    variables: dict,
    apply_fn: Callable,
    cfg: OptimizerConfig,
    *,
    frozen_mask: Any = None,
) -> TrainState:
    """Build a TrainState; ``frozen_mask`` (pytree of bool, True=frozen)
    zeroes updates for frozen subtrees (encoder freezing, SURVEY.md C11)."""
    tx = make_optimizer(cfg)
    if frozen_mask is not None:
        tx = optax.chain(
            tx,
            optax.masked(optax.set_to_zero(), frozen_mask),
        )
    return TrainState.create(
        apply_fn=apply_fn,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
        spectral=variables.get("spectral"),
    )


def freeze_mask_for(params: Any, *prefixes: str) -> Any:
    """bool pytree: True for params under any top-level prefix (e.g.
    'encoder') — feeds ``create_train_state(frozen_mask=...)``."""

    def mark(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return any(top == p or top.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(mark, params)
