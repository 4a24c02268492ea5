"""Inpainting training driver (SURVEY.md C11 rebuilt as a CLI).

    python -m text_segmentation_image_inpainting_tpu.train.run_inpaint \
        --steps 1000 --batch-size 8 --ckpt-dir checkpoints/inpaint

Implements the paper's two-phase schedule via flags: train with
``--freeze-bn`` for the fine-tune phase (encoder BN frozen, LR lowered),
matching the reference capability (SURVEY.md C11). VGG16 weights load
from ``--vgg-ckpt`` (a torchvision ``vgg16`` state_dict imported via
compat/) or random-init for loss-shape development when unavailable
(no-network environment, SURVEY.md "hard parts" #3).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.data.pipeline import (
    DevicePrefetcher,
    list_image_paths,
    make_dataset,
)
from text_segmentation_image_inpainting_tpu.models import InpaintUNet, VGG16Features
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
from text_segmentation_image_inpainting_tpu.losses.inpainting import InpaintLossConfig
from text_segmentation_image_inpainting_tpu.train.config import (
    InpaintTrainConfig,
    OptimizerConfig,
)
from text_segmentation_image_inpainting_tpu.train.inpaint import (
    make_inpaint_eval_step,
    make_inpaint_train_step,
)
from text_segmentation_image_inpainting_tpu.train.state import create_train_state
from text_segmentation_image_inpainting_tpu.train.val import make_val_batches, scored_eval
from text_segmentation_image_inpainting_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--freeze-bn", action="store_true", help="phase-2 fine-tune")
    p.add_argument("--attention", action="store_true",
                   help="SAGAN self-attention at the U-Net bottleneck "
                        "(experiment track)")
    p.add_argument("--attention-sn", action="store_true",
                   help="spectral-normalize the attention projections "
                        "(implies --attention)")
    p.add_argument("--pconv-impl", choices=["xla", "pallas"], default="xla")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="split each batch into k microbatches, average "
                        "their grads, apply ONE optimizer update (pairs "
                        "with --remat full for big batches/pages on "
                        "tight HBM)")
    p.add_argument("--remat", choices=["none", "full"], default="none",
                   help="U-Net activation rematerialization in the "
                        "backward (docs/KERNEL_NOTES.md round 3)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="scan k train steps inside ONE jit dispatch "
                        "(amortizes per-dispatch host cost; clamped to "
                        "divide --log-every and --ckpt-every)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--fused-stem", action="store_true", default=False,
                   help="route the VGG stem backward through the fused "
                        "Pallas dx kernel (ops/pallas/vgg_stem_bwd.py)")
    p.add_argument("--vgg-ckpt", type=str, default=None, help="torchvision vgg16 .pth")
    p.add_argument("--ckpt-dir", type=str, default="checkpoints/inpaint")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val-batches", type=int, default=2,
                   help="held-out val batches scored every --log-every "
                        "window (0 = score the train batch, old behavior)")
    p.add_argument("--export", type=str, default=None,
                   help="write a single-file model snapshot (msgpack) at the end")
    return p.parse_args(argv)


def load_vgg_variables(vgg: VGG16Features, ckpt_path: str | None, rng, sample):
    template = jax.jit(vgg.init)(rng, sample)
    if not ckpt_path:
        print("WARNING: random VGG16 weights (no --vgg-ckpt given); "
              "perceptual/style terms are untrained-feature losses")
        return template
    from text_segmentation_image_inpainting_tpu.compat.torch_import import (
        import_vgg16_features,
        load_torch_file,
        tolerant_import,
    )

    sd = load_torch_file(ckpt_path)
    return tolerant_import(template, import_vgg16_features(sd))


def main(argv=None):
    args = parse_args(argv)
    cfg = InpaintTrainConfig(
        image_size=(args.image_size, args.image_size),
        batch_size=args.batch_size,
        depth=args.depth,
        freeze_bn=args.freeze_bn,
        attention=args.attention or args.attention_sn,
        attention_sn=args.attention_sn,
        grad_accum=args.grad_accum,
        remat=args.remat,
        bf16_compute=args.bf16,
        # --no-bf16 means a fully fp32 step: the config's bf16-VGG
        # training default must follow the flag, or the fp32 debug path
        # silently keeps bf16-rounded perceptual/style gradients
        loss=InpaintLossConfig(
            vgg_dtype="bfloat16" if args.bf16 else "float32",
            fused_stem=args.fused_stem,
        ),
        pconv_impl=args.pconv_impl,
        optimizer=OptimizerConfig(learning_rate=args.lr),
        checkpoint_every=args.ckpt_every,
        log_every=args.log_every,
    )
    mesh = make_mesh_for_batch(cfg.batch_size)
    dtype = jnp.bfloat16 if cfg.bf16_compute else jnp.float32
    model = InpaintUNet(
        depth=cfg.depth, impl=cfg.pconv_impl, attention=cfg.attention,
        attention_sn=cfg.attention_sn, dtype=dtype,
    )
    vgg = VGG16Features(dtype=dtype)

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
        "inpaint", batch_size=cfg.batch_size, size=cfg.image_size, seed=args.seed,
        paths=paths,
    )

    k0, k1 = jax.random.split(jax.random.key(args.seed))
    sample = jnp.zeros((1, *cfg.image_size, 3), jnp.float32)
    ones = jnp.ones((1, *cfg.image_size, 1), jnp.float32)
    variables = jax.jit(model.init)(k0, sample, ones)
    vgg_vars = jax.device_put(
        load_vgg_variables(vgg, args.vgg_ckpt, k1, sample), replicated(mesh)
    )
    state = create_train_state(variables, model.apply, cfg.optimizer)
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

    step_fn = make_inpaint_train_step(model, cfg, vgg_vars)
    if spd > 1:
        train_step = jax.jit(make_multi_step(step_fn), donate_argnums=0)
    else:
        train_step = jax.jit(step_fn, donate_argnums=0)
    eval_step = jax.jit(make_inpaint_eval_step(model))
    logger = MetricLogger("inpaint")

    # fixed deterministic held-out set (disjoint seed stream): in-batch
    # "eval" flatters the curve — it scores pages the step just trained on
    val_batches = make_val_batches(
        "inpaint", cfg, mesh, seed=args.seed + 100_000, n=args.val_batches, paths=paths
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
                # log lines keep psnr/ssim signals at every spd
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
        if state.spectral is not None:
            snapshot["spectral"] = jax.device_get(state.spectral)
        save_model(args.export, snapshot)
        print("exported model snapshot to", args.export)
    print("done:", int(state.step), "steps")
    return state


if __name__ == "__main__":
    main()
