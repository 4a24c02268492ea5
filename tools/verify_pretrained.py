#!/usr/bin/env python
"""One-command pretrained-weight drop-in validation.

The reference trains from ImageNet-pretrained backbones — torchvision
MobileNetV2 for the segmentation encoder and torchvision VGG16 for the
perceptual/style loss (SURVEY.md C3/C7 [R]). This environment is
offline, so the real weight files cannot be fetched; the importers
exist and are unit-tested against synthetic state_dicts. This tool
closes the loop the day the files appear:

    python tools/verify_pretrained.py --vgg16 vgg16.pth \
        --mobilenet mobilenet_v2.pth [--eval] [--size 64]

Per provided file it
  1. imports the torch ``state_dict`` into flax variables,
  2. tolerant-merges into the model template and gates on coverage
     (every backbone leaf must fill; zero shape mismatches),
  3. runs numerical parity vs the in-repo torch-CPU oracle AT THE
     IMPORTED WEIGHTS on a fixed input (the oracle consumes the same
     file through torch, so both frameworks run identical weights),
  4. with ``--eval``: re-runs the held-out synthetic eval with the
     imported encoder merged over the committed trained segmenter
     snapshot (informational — a backbone swap under a decoder trained
     against a different backbone is expected to move the numbers),
  5. with ``--finetune N``: merges the imported encoder into a fresh
     segmenter and runs N real train steps on the synthetic stream,
     gating on every-leaf-filled + finite losses + loss decrease.

``--fabricate DIR`` first writes synthetic torchvision-layout ``.pth``
files (via the in-repo torch oracle) and runs the chain on those — the
recorded known-good transcript lives at
``docs/quality_data/verify_pretrained_run.txt``; rerun the same command
with ``--vgg16/--mobilenet`` pointing at the real files when they
appear.

Prints ONE JSON verdict line; exit code 0 iff every gate passes.
Synthetic state_dicts produced by the repo's torch oracle stand in for
the real files in ``tests/test_verify_pretrained.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _filter_to_model(torch, model, sd: dict):
    """Keep only keys the torch model has AND whose shapes match (torch's
    strict=False still hard-errors on shape mismatches); returns
    (loadable_sd, missing_keys) — a shape-mangled entry counts missing,
    which fails the gate."""
    import numpy as np

    ref = model.state_dict()
    out, missing = {}, set()
    for k, want in ref.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k in sd and tuple(np.asarray(sd[k]).shape) == tuple(want.shape):
            out[k] = torch.as_tensor(np.asarray(sd[k]))
        else:
            missing.add(k)
    return out, missing


def _report_counts(report: dict) -> dict:
    return {
        "used": len(report["used"]),
        "skipped_missing": len(report["skipped_missing"]),
        "skipped_shape": len(report["skipped_shape"]),
        "unfilled": len(report["unfilled"]),
    }


def mobilenet_name_pairs():
    """(torchvision_name, oracle_name) module pairs for mobilenet_v2 —
    the rename table between torchvision's published layout and this
    repo's torch oracle (``tests/oracle/torch_ref.MobileNetV2Encoder``).
    Same table as the fabrication in tests/test_models_parity.py."""
    from tests.oracle.torch_ref import MOBILENETV2_CONFIG

    pairs = [("features.0.0", "stem.0"), ("features.0.1", "stem.1")]
    idx, feat = 0, 1
    for t, _, n, _ in MOBILENETV2_CONFIG:
        for _ in range(n):
            bp = f"blocks.{idx}.block"
            cp = f"features.{feat}.conv"
            if t == 1:
                pairs += [(f"{cp}.0.0", f"{bp}.0.0"), (f"{cp}.0.1", f"{bp}.0.1"),
                          (f"{cp}.1", f"{bp}.1"), (f"{cp}.2", f"{bp}.2")]
            else:
                pairs += [(f"{cp}.0.0", f"{bp}.0.0"), (f"{cp}.0.1", f"{bp}.0.1"),
                          (f"{cp}.1.0", f"{bp}.1.0"), (f"{cp}.1.1", f"{bp}.1.1"),
                          (f"{cp}.2", f"{bp}.2"), (f"{cp}.3", f"{bp}.3")]
            idx += 1
            feat += 1
    return pairs


_BN_SUFFIXES = ("weight", "bias", "running_mean", "running_var")


def tv_to_oracle_mobilenet(sd: dict) -> dict:
    """torchvision names -> oracle names (so the oracle runs the SAME
    imported weights for the parity check)."""
    out = {}
    for tv, orc in mobilenet_name_pairs():
        for suff in _BN_SUFFIXES:
            if f"{tv}.{suff}" in sd:
                out[f"{orc}.{suff}"] = sd[f"{tv}.{suff}"]
    return out


def oracle_to_tv_mobilenet(sd: dict) -> dict:
    """Oracle names -> torchvision names (test fabrication of a
    torchvision-layout state_dict when no real file is available)."""
    out = {}
    for tv, orc in mobilenet_name_pairs():
        for suff in _BN_SUFFIXES:
            if f"{orc}.{suff}" in sd:
                out[f"{tv}.{suff}"] = sd[f"{orc}.{suff}"]
    return out


def verify_vgg16(path: str, size: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from tests.oracle import torch_ref
    from text_segmentation_image_inpainting_tpu.compat.torch_import import (
        import_vgg16_features,
        load_torch_file,
        tolerant_import,
    )
    from text_segmentation_image_inpainting_tpu.models.vgg import VGG16Features

    sd = load_torch_file(path)
    jvgg = VGG16Features(normalize=False)
    template = jax.jit(jvgg.init)(jax.random.key(0), jnp.zeros((1, size, size, 3)))
    variables, report = tolerant_import(
        template, import_vgg16_features(sd), return_report=True
    )
    counts = _report_counts(report)

    ovgg = torch_ref.VGG16Features().eval()
    osd, missing = _filter_to_model(torch, ovgg, sd)
    ovgg.load_state_dict(osd, strict=False)

    x = np.random.default_rng(0).random((1, size, size, 3)).astype(np.float32)
    # parity must hold on ANY backend: TPU convs default to bf16 inputs
    # (max err ~2e-3 vs the fp32 torch oracle); force full precision for
    # the check itself — tolerances below are fp32-accumulation-sized
    with jax.default_matmul_precision("highest"):
        got = jax.jit(jvgg.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        want = ovgg(torch.from_numpy(np.moveaxis(x, -1, 1)))
    max_err = max(
        float(np.abs(np.asarray(g) - np.moveaxis(w.numpy(), 1, -1)).max())
        for g, w in zip(got, want)
    )
    ok = (
        counts["unfilled"] == 0
        and counts["skipped_shape"] == 0
        and not missing
        and max_err < 1e-4
    )
    return {"ok": bool(ok), "coverage": counts, "oracle_missing_keys": sorted(missing),
            "max_abs_err": max_err, "tol": 1e-4}


def verify_mobilenet(path: str, size: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from tests.oracle import torch_ref
    from text_segmentation_image_inpainting_tpu.compat.torch_import import (
        import_torchvision_mobilenetv2,
        load_torch_file,
    )
    from text_segmentation_image_inpainting_tpu.models.base import tolerant_merge
    from text_segmentation_image_inpainting_tpu.models.mobilenet_v2 import MobileNetV2Encoder
    from text_segmentation_image_inpainting_tpu.models.text_segmentation import TextSegmenter

    sd = load_torch_file(path)
    enc = MobileNetV2Encoder(width_mult=1.0, output_stride=8)
    x = np.random.default_rng(0).random((1, size, size, 3)).astype(np.float32)
    template = jax.jit(enc.init)(jax.random.key(0), jnp.asarray(x))
    variables, report = tolerant_merge(template, import_torchvision_mobilenetv2(sd))
    counts = _report_counts(report)

    # same weights through the torch oracle
    oenc = torch_ref.MobileNetV2Encoder(width_mult=1.0, output_stride=8).eval()
    osd, missing = _filter_to_model(torch, oenc, tv_to_oracle_mobilenet(sd))
    oenc.load_state_dict(osd, strict=False)

    with jax.default_matmul_precision("highest"):  # see verify_vgg16
        got = jax.jit(enc.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        want = oenc(torch.from_numpy(np.moveaxis(x, -1, 1)))
    errs = {
        k: float(np.abs(np.asarray(got[k]) - np.moveaxis(want[k].numpy(), 1, -1)).max())
        for k in ("s2", "s4", "out")
    }
    max_err = max(errs.values())

    # does it drop into the full segmenter? (encoder subtree must fill)
    seg = TextSegmenter(width_mult=1.0, output_stride=8)
    seg_template = jax.jit(seg.init)(jax.random.key(0), jnp.asarray(x))
    _, seg_report = tolerant_merge(
        seg_template, import_torchvision_mobilenetv2(sd, path=("encoder",))
    )
    enc_unfilled = [k for k in seg_report["unfilled"] if "encoder" in k]

    ok = (
        counts["unfilled"] == 0
        and counts["skipped_shape"] == 0
        and not missing
        and not enc_unfilled
        and max_err < 5e-4
    )
    return {"ok": bool(ok), "coverage": counts, "oracle_missing_keys": sorted(missing),
            "segmenter_encoder_unfilled": enc_unfilled[:5],
            "tap_max_abs_err": errs, "tol": 5e-4}


def eval_with_encoder(path: str, size: int, batches: int) -> dict:
    """Held-out synthetic seg eval with the imported encoder merged over
    the committed trained snapshot (informational)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from text_segmentation_image_inpainting_tpu.compat.torch_import import (
        import_torchvision_mobilenetv2,
        load_torch_file,
    )
    from text_segmentation_image_inpainting_tpu.models.base import (
        load_model,
        save_model,
        tolerant_merge,
    )
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline
    from text_segmentation_image_inpainting_tpu.train import evaluate

    trained = Path(__file__).resolve().parent.parent / "trained" / "seg_synth.msgpack"
    if not trained.exists():
        return {"skipped": f"no trained snapshot at {trained}"}
    pipe = TextRemovalPipeline()
    seg_vars, _ = pipe.init_variables(jax.random.key(0), (size, size))
    seg_vars = load_model(str(trained), seg_vars)
    merged, _ = tolerant_merge(
        seg_vars, import_torchvision_mobilenetv2(load_torch_file(path), path=("encoder",))
    )
    with tempfile.NamedTemporaryFile(suffix=".msgpack", delete=False) as f:
        tmp = f.name
    save_model(tmp, merged)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        evaluate.main(["--task", "seg", "--seg-ckpt", tmp, "--size", str(size),
                       "--batches", str(batches)])
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def finetune_smoke(path: str, steps: int, size: int = 128, batch: int = 4) -> dict:
    """The 'does it train' leg of the drop-in runbook (VERDICT r4 task 8):
    merge the imported encoder into a fresh segmenter and fine-tune for
    ``steps`` real train steps on the synthetic stream. Gates: every
    encoder leaf filled, every loss finite, and the mean loss over the
    last quarter below the mean over the first quarter."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from text_segmentation_image_inpainting_tpu.compat.torch_import import (
        import_torchvision_mobilenetv2,
        load_torch_file,
    )
    from text_segmentation_image_inpainting_tpu.data.pipeline import make_dataset
    from text_segmentation_image_inpainting_tpu.models.base import tolerant_merge
    from text_segmentation_image_inpainting_tpu.models.text_segmentation import (
        TextSegmenter,
    )
    from text_segmentation_image_inpainting_tpu.train import (
        SegTrainConfig,
        create_train_state,
        make_seg_train_step,
    )

    cfg = SegTrainConfig(image_size=(size, size), batch_size=batch)
    model = TextSegmenter(dtype=jnp.bfloat16 if cfg.bf16_compute else jnp.float32)
    template = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.float32)
    )
    variables, report = tolerant_merge(
        template, import_torchvision_mobilenetv2(load_torch_file(path), path=("encoder",))
    )
    enc_unfilled = [k for k in report["unfilled"] if "encoder" in k]

    state = create_train_state(variables, model.apply, cfg.optimizer)
    step_fn = jax.jit(make_seg_train_step(model, cfg), donate_argnums=0)
    it = make_dataset("seg", batch_size=batch, size=(size, size), seed=0)
    totals = []
    for _ in range(steps):
        state, metrics = step_fn(state, next(it))
        totals.append(float(metrics["total"]))
    q = max(1, steps // 4)
    first_q, last_q = float(np.mean(totals[:q])), float(np.mean(totals[-q:]))
    ok = (
        not enc_unfilled
        and all(np.isfinite(t) for t in totals)
        and last_q < first_q
    )
    return {
        "ok": bool(ok),
        "steps": steps,
        "size": size,
        "batch": batch,
        "encoder_unfilled": enc_unfilled[:5],
        "loss_first_quarter": round(first_q, 4),
        "loss_last_quarter": round(last_q, 4),
        "loss_final": round(totals[-1], 4),
    }


def fabricate(out_dir: str) -> dict:
    """Write synthetic-but-torchvision-layout vgg16/mobilenet_v2 .pth
    files (the repo's torch oracle generates the weights — same
    fabrication as tests/test_verify_pretrained.py), so the full chain
    has something to run against until the real files appear."""
    import torch

    from tests.oracle import torch_ref

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(0)
    vsd = torch_ref.VGG16Features().state_dict()
    vsd["classifier.0.weight"] = torch.zeros(8, 8)  # real files carry extras
    torch.save(vsd, out / "vgg16.pth")
    torch.manual_seed(1)
    osd = torch_ref.MobileNetV2Encoder(width_mult=1.0, output_stride=8).state_dict()
    tsd = oracle_to_tv_mobilenet(osd)
    tsd["features.18.0.weight"] = torch.zeros(1280, 320, 1, 1)
    tsd["classifier.1.weight"] = torch.zeros(1000, 1280)
    torch.save(tsd, out / "mobilenet_v2.pth")
    return {"vgg16": str(out / "vgg16.pth"), "mobilenet": str(out / "mobilenet_v2.pth")}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vgg16", type=str, default=None, help="torchvision vgg16 .pth")
    p.add_argument("--mobilenet", type=str, default=None,
                   help="torchvision mobilenet_v2 .pth")
    p.add_argument("--fabricate", type=str, default=None, metavar="DIR",
                   help="first fabricate synthetic torchvision-layout .pth "
                        "files into DIR and run the chain on those (stand-in "
                        "recipe until the real files appear)")
    p.add_argument("--size", type=int, default=64,
                   help="parity input size (64 is plenty; all convs exercised)")
    p.add_argument("--eval", action="store_true",
                   help="also re-run held-out synthetic seg eval with the "
                        "imported encoder over the trained snapshot")
    p.add_argument("--eval-size", type=int, default=512)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--finetune", type=int, default=0, metavar="N",
                   help="fine-tune the merged segmenter for N steps on the "
                        "synthetic stream and gate on the loss decreasing")
    p.add_argument("--finetune-size", type=int, default=128)
    p.add_argument("--finetune-batch", type=int, default=4)
    args = p.parse_args(argv)
    if args.fabricate:
        made = fabricate(args.fabricate)
        args.vgg16 = args.vgg16 or made["vgg16"]
        args.mobilenet = args.mobilenet or made["mobilenet"]
    if not args.vgg16 and not args.mobilenet:
        p.error("provide --vgg16 and/or --mobilenet (or --fabricate DIR)")

    verdict: dict = {}
    if args.vgg16:
        verdict["vgg16"] = verify_vgg16(args.vgg16, args.size)
    if args.mobilenet:
        verdict["mobilenet_v2"] = verify_mobilenet(args.mobilenet, args.size)
        if args.eval:
            verdict["heldout_eval"] = eval_with_encoder(
                args.mobilenet, args.eval_size, args.eval_batches
            )
        if args.finetune:
            verdict["finetune_smoke"] = finetune_smoke(
                args.mobilenet, args.finetune, args.finetune_size, args.finetune_batch
            )
    verdict["ok"] = all(v.get("ok", True) for v in verdict.values() if isinstance(v, dict))
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
