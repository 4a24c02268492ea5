"""Segmentation training driver (SURVEY.md C11 rebuilt as a CLI).

    python -m text_segmentation_image_inpainting_tpu.train.run_seg \
        --steps 1000 --batch-size 8 --ckpt-dir checkpoints/seg

Replaces the reference's ad-hoc notebook loop: Grain pipeline ->
device prefetch -> jit'd SPMD train step over the data mesh -> metrics
logging -> async Orbax checkpoints with restore-latest resume.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from text_segmentation_image_inpainting_tpu.data.pipeline import (
    list_image_paths,
    DevicePrefetcher,
    make_dataset,
)
from text_segmentation_image_inpainting_tpu.models import TextSegmenter
from text_segmentation_image_inpainting_tpu.parallel import (
    batch_sharding,
    make_mesh_for_batch,
    replicated,
    stacked_batch_sharding,
)
from text_segmentation_image_inpainting_tpu.train.multistep import (
    clamp_steps_per_dispatch,
    make_multi_step,
    stack_host_batches,
)
from text_segmentation_image_inpainting_tpu.train.checkpoint import CheckpointManager
from text_segmentation_image_inpainting_tpu.train.config import (
    OptimizerConfig,
    SegTrainConfig,
)
from text_segmentation_image_inpainting_tpu.train.seg import (
    make_seg_eval_step,
    make_seg_train_step,
)
from text_segmentation_image_inpainting_tpu.train.state import (
    create_train_state,
    freeze_mask_for,
)
from text_segmentation_image_inpainting_tpu.train.val import make_val_batches, scored_eval
from text_segmentation_image_inpainting_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--width-mult", type=float, default=1.0)
    p.add_argument("--backbone", choices=("mobilenet_v2", "xception"), default="mobilenet_v2")
    p.add_argument("--head", choices=("mini", "deeplab"), default="mini")
    p.add_argument("--output-stride", type=int, default=8, choices=(8, 16, 32))
    p.add_argument("--decoder-mid", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--pos-weight", type=float, default=3.0)
    p.add_argument("--freeze-encoder", action="store_true")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into k microbatches, average "
                        "their grads, apply ONE optimizer update "
                        "(big effective batches on tight HBM)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="scan k train steps inside ONE jit dispatch "
                        "(amortizes per-dispatch host cost; clamped to "
                        "divide --log-every and --ckpt-every)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--ckpt-dir", type=str, default="checkpoints/seg")
    p.add_argument("--data-dir", type=str, default=None, help="image folder; synthetic if unset")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val-batches", type=int, default=2,
                   help="held-out val batches scored every --log-every "
                        "window (0 = score the train batch, old behavior)")
    p.add_argument("--export", type=str, default=None,
                   help="write a single-file model snapshot (msgpack) at the end")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = SegTrainConfig(
        image_size=(args.image_size, args.image_size),
        batch_size=args.batch_size,
        width_mult=args.width_mult,
        backbone=args.backbone,
        head=args.head,
        output_stride=args.output_stride,
        decoder_mid=args.decoder_mid,
        pos_weight=args.pos_weight,
        freeze_encoder=args.freeze_encoder,
        grad_accum=args.grad_accum,
        bf16_compute=args.bf16,
        optimizer=OptimizerConfig(learning_rate=args.lr),
        checkpoint_every=args.ckpt_every,
        log_every=args.log_every,
    )
    mesh = make_mesh_for_batch(cfg.batch_size)
    dtype = jnp.bfloat16 if cfg.bf16_compute else jnp.float32
    model = TextSegmenter(
        width_mult=cfg.width_mult, output_stride=cfg.output_stride,
        decoder_mid=cfg.decoder_mid, backbone=cfg.backbone, head=cfg.head,
        dtype=dtype,
    )

    if cfg.batch_size % cfg.grad_accum != 0:
        raise SystemExit(
            f"--grad-accum {cfg.grad_accum} must divide --batch-size {cfg.batch_size}"
        )
    spd = clamp_steps_per_dispatch(
        args.steps_per_dispatch, cfg.log_every, cfg.checkpoint_every
    )
    if spd != args.steps_per_dispatch:
        print(
            f"steps-per-dispatch clamped {args.steps_per_dispatch} -> {spd} "
            "(must divide --log-every and --ckpt-every)"
        )

    paths = list_image_paths(args.data_dir) if args.data_dir else None
    host_it = make_dataset(
        "seg", batch_size=cfg.batch_size, size=cfg.image_size, seed=args.seed, paths=paths
    )

    sample = jnp.zeros((1, *cfg.image_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(args.seed), sample)
    frozen = freeze_mask_for(variables["params"], "encoder") if cfg.freeze_encoder else None
    state = create_train_state(variables, model.apply, cfg.optimizer, frozen_mask=frozen)
    state = jax.device_put(state, replicated(mesh))

    ckpt = CheckpointManager(args.ckpt_dir, save_interval_steps=cfg.checkpoint_every)
    state, restored_step = ckpt.restore_latest(state)
    if restored_step is not None:
        print(f"resumed from step {restored_step}")
    first_step = int(state.step)
    if spd > 1 and first_step % spd != 0:
        # resume normally lands on a checkpoint multiple (spd divides
        # ckpt-every), but a hand-placed checkpoint may not — keep the
        # log/ckpt edges exact rather than drift them
        print(f"steps-per-dispatch disabled: resumed step {first_step} not a multiple of {spd}")
        spd = 1

    if spd > 1:
        prefetch = DevicePrefetcher(
            stack_host_batches(host_it, spd), stacked_batch_sharding(mesh)
        )
    else:
        prefetch = DevicePrefetcher(host_it, batch_sharding(mesh))

    step_fn = make_seg_train_step(model, cfg)
    if spd > 1:
        train_step = jax.jit(make_multi_step(step_fn), donate_argnums=0)
    else:
        train_step = jax.jit(step_fn, donate_argnums=0)
    eval_step = jax.jit(make_seg_eval_step(model))
    logger = MetricLogger("seg")

    # fixed deterministic held-out set (disjoint seed stream): in-batch
    # "eval" flatters the curve — it scores pages the step just trained on
    val_batches = make_val_batches(
        "seg", cfg, mesh, seed=args.seed + 100_000, n=args.val_batches, paths=paths
    )

    t0 = time.time()
    window_start = first_step  # true step count per window: resume can
    # land mid-window, and the compile step is excluded below — a fixed
    # log_every numerator over-reported pages/s in both cases
    end_step = args.steps
    if spd > 1:
        end_step = first_step + max(0, args.steps - first_step) // spd * spd
        if end_step != args.steps:
            print(f"--steps truncated {args.steps} -> {end_step} "
                  "(multiple of steps-per-dispatch)")
    for step in range(first_step, end_step, spd):
        batch = next(prefetch)
        state, metrics = train_step(state, batch)
        done = step + spd
        if spd > 1:
            # metrics come back stacked (spd,); report the freshest step
            metrics = jax.tree.map(lambda x: x[-1], metrics)
        if step == first_step:
            t0 = time.time()  # exclude jit compile from the first rate
            window_start = done
        if done % cfg.log_every == 0:
            # snapshot BEFORE eval so val scoring time never pollutes
            # the reported train throughput
            train_elapsed = time.time() - t0
            steps_in_window = done - window_start
            m = {k: float(v) for k, v in metrics.items()}
            if val_batches:
                m.update(scored_eval(eval_step, state, val_batches))
            else:
                # in-batch eval: under spd > 1 the dispatch batch is
                # stacked (spd, N, ...) — score its freshest slice so
                # log lines keep iou/psnr signals at every spd
                last = (
                    jax.tree.map(lambda x: x[-1], batch) if spd > 1 else batch
                )
                m.update(scored_eval(eval_step, state, [last], prefix=""))
            if steps_in_window > 0:
                m["pages_per_sec"] = (
                    steps_in_window * cfg.batch_size / max(train_elapsed, 1e-9)
                )
            logger.log(done, m)
            t0 = time.time()
            window_start = done
        ckpt.save(done, state)
    ckpt.wait()
    ckpt.close()
    prefetch.close()
    if args.export:
        from text_segmentation_image_inpainting_tpu.models.base import save_model

        snapshot = {"params": jax.device_get(state.params)}
        if state.batch_stats is not None:
            snapshot["batch_stats"] = jax.device_get(state.batch_stats)
        save_model(args.export, snapshot)
        print("exported model snapshot to", args.export)
    print("done:", int(state.step), "steps")
    return state


if __name__ == "__main__":
    main()
