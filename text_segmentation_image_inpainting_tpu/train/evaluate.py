"""Evaluation CLI — the parity-gate metrics (BASELINE.json:2).

    python -m text_segmentation_image_inpainting_tpu.train.evaluate \
        --task seg|inpaint|pipeline --batches 8 \
        [--seg-ckpt ... --unet-ckpt ...]

Computes mask IoU / precision / recall (``--task seg``), PSNR / SSIM /
L1 (``--task inpaint``), or the pipeline's end-to-end ``mask_iou``
(``--task pipeline`` — the seg-style dataset has no clean ground-truth
page, so reconstruction metrics are only defined for the inpaint task),
over a deterministic synthetic validation set (or ``--data-dir``
images). Prints one JSON line for scripting.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", choices=["seg", "inpaint", "pipeline"], default="pipeline")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seg-ckpt", type=str, default=None)
    p.add_argument("--unet-ckpt", type=str, default=None)
    # model geometry — must match the trained checkpoints
    p.add_argument("--width-mult", type=float, default=1.0)
    p.add_argument("--backbone", choices=("mobilenet_v2", "xception"),
                   default="mobilenet_v2")
    p.add_argument("--head", choices=("mini", "deeplab"), default="mini")
    p.add_argument("--output-stride", type=int, default=8, choices=(8, 16, 32))
    p.add_argument("--decoder-mid", type=int, default=128)
    p.add_argument("--depth", type=int, default=8, help="inpaint U-Net depth")
    p.add_argument("--attention", action="store_true")
    p.add_argument("--attention-sn", action="store_true")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    from text_segmentation_image_inpainting_tpu.data.pipeline import (
        list_image_paths,
        make_dataset,
    )
    from text_segmentation_image_inpainting_tpu.models.base import load_model
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline
    from text_segmentation_image_inpainting_tpu.train.metrics import iou, psnr, ssim

    from text_segmentation_image_inpainting_tpu.models import InpaintUNet, TextSegmenter

    size = (args.size, args.size)
    pipe = TextRemovalPipeline(
        seg=TextSegmenter(
            width_mult=args.width_mult, output_stride=args.output_stride,
            decoder_mid=args.decoder_mid, backbone=args.backbone, head=args.head,
            dtype=jnp.bfloat16,
        ),
        unet=InpaintUNet(
            depth=args.depth, attention=args.attention or args.attention_sn,
            attention_sn=args.attention_sn, dtype=jnp.bfloat16,
        ),
    )
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), size)
    if args.seg_ckpt:
        seg_vars = load_model(args.seg_ckpt, seg_vars)
    if args.unet_ckpt:
        unet_vars = load_model(args.unet_ckpt, unet_vars)

    kind = "seg" if args.task == "seg" else "inpaint"
    if args.task == "pipeline":
        kind = "seg"  # pipeline eval consumes (page_with_text, gt_text_mask)
    paths = list_image_paths(args.data_dir) if args.data_dir else None
    it = make_dataset(
        kind, batch_size=args.batch_size, size=size, seed=args.seed, paths=paths
    )

    @jax.jit
    def eval_seg(batch):
        # score the raw thresholded mask — dilation (used only for the
        # inpainting hand-off) would systematically deflate IoU/precision
        mask = pipe.segment(seg_vars, batch["image"], dilate=False).astype(jnp.float32)
        gt = batch["mask"]
        tp = jnp.sum(mask * gt)
        return {
            "iou": iou(mask, gt),
            "precision": tp / jnp.maximum(jnp.sum(mask), 1e-6),
            "recall": tp / jnp.maximum(jnp.sum(gt), 1e-6),
        }

    @jax.jit
    def eval_inpaint(batch):
        comp = pipe.inpaint(unet_vars, batch["image"], 1.0 - batch["mask"]).astype(
            jnp.float32
        )
        gt = batch["image"]
        return {"psnr": psnr(comp, gt), "ssim": ssim(comp, gt),
                "l1": jnp.mean(jnp.abs(comp - gt))}

    @jax.jit
    def eval_pipeline(batch):
        # IoU on the undilated mask (same rationale as eval_seg) — one
        # segmenter forward; the dilated inpaint hand-off mask is scored
        # nowhere, so the full pipe.run is not needed here
        raw_mask = pipe.segment(seg_vars, batch["image"], dilate=False)
        return {"mask_iou": iou(raw_mask.astype(jnp.float32), batch["mask"])}

    fn = {"seg": eval_seg, "inpaint": eval_inpaint, "pipeline": eval_pipeline}[args.task]
    acc: dict = {}
    for _ in range(args.batches):
        batch = next(it)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        m = fn(batch)
        for k, v in m.items():
            acc.setdefault(k, []).append(float(v))
    result = {k: float(np.mean(v)) for k, v in acc.items()}
    result.update(task=args.task, batches=args.batches, batch_size=args.batch_size)
    print(json.dumps(result))
    return result


def cli(argv=None) -> None:
    """Console-script entry: setuptools wraps the return value in
    ``sys.exit`` — ``main``'s result dict would read as exit status 1."""
    main(argv)


if __name__ == "__main__":
    main()
