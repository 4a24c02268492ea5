"""Demo CLI: run the fused text-removal pipeline and save before/after
images (the reference's README demo, SURVEY.md C13, as a command).

    python -m text_segmentation_image_inpainting_tpu.pipeline.demo \
        --out demo_out --pages 2 \
        [--seg-ckpt seg.msgpack --unet-ckpt unet.msgpack] [--images dir/]

Without checkpoints the models run with fresh random weights — useful
for exercising the pipeline and producing layout/mask visualizations;
with trained checkpoints it reproduces the reference's qualitative
before/after pages.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_png(path: str, arr: np.ndarray):
    from PIL import Image

    arr = np.clip(np.asarray(arr, dtype=np.float32), 0.0, 1.0)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, default="demo_out")
    p.add_argument("--pages", type=int, default=2)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seg-ckpt", type=str, default=None)
    p.add_argument("--unet-ckpt", type=str, default=None)
    p.add_argument("--images", type=str, default=None, help="input image dir; synthetic if unset")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--dilate", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from text_segmentation_image_inpainting_tpu.data.text_overlay import (
        segmentation_sample,
    )
    from text_segmentation_image_inpainting_tpu.models.base import load_model
    from text_segmentation_image_inpainting_tpu.pipeline import (
        TextRemovalPipeline,
        preprocess_page,
    )

    rng = np.random.default_rng(args.seed)
    size = (args.size, args.size)
    if args.images:
        from PIL import Image

        exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
        files = sorted(
            f for f in os.listdir(args.images) if f.lower().endswith(exts)
        )[: args.pages]
        if not files:
            raise SystemExit(f"--images {args.images}: no image files found")
        args.pages = len(files)  # fewer images than --pages is fine
        loaded = [
            np.asarray(
                Image.open(os.path.join(args.images, f)).convert("RGB"), np.float32
            )
            / 255.0
            for f in files
        ]
        pages = np.stack(
            [np.asarray(preprocess_page(jnp.asarray(p[None]), size))[0] for p in loaded]
        )
        gt_masks = None
    else:
        samples = [segmentation_sample(rng, size) for _ in range(args.pages)]
        pages = np.stack([s[0] for s in samples])
        gt_masks = np.stack([s[1] for s in samples])

    pipe = TextRemovalPipeline(threshold=args.threshold, dilate_radius=args.dilate)
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(args.seed), size)
    if args.seg_ckpt:
        seg_vars = load_model(args.seg_ckpt, seg_vars)
    if args.unet_ckpt:
        unet_vars = load_model(args.unet_ckpt, unet_vars)

    clean, masks = jax.jit(pipe.run)(seg_vars, unet_vars, jnp.asarray(pages))
    clean, masks = np.asarray(clean), np.asarray(masks)

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.pages):
        save_png(os.path.join(args.out, f"page{i}_before.png"), pages[i])
        save_png(os.path.join(args.out, f"page{i}_mask.png"), masks[i])
        save_png(os.path.join(args.out, f"page{i}_after.png"), clean[i])
        if gt_masks is not None:
            save_png(os.path.join(args.out, f"page{i}_gtmask.png"), gt_masks[i])
    print(f"wrote {args.pages} before/mask/after triplets to {args.out}/")


if __name__ == "__main__":
    main()
