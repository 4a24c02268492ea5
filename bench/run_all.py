"""Run all five canonical benchmark configs (BASELINE.md:19-25), one
JSON line each, and write ``bench/results.json``.

    python -m bench.run_all [--quick]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

CONFIGS = [
    ("1-seg-forward", ["bench/bench_seg_forward.py"]),
    ("2-inpaint-forward", ["bench/bench_inpaint_forward.py"]),
    ("3-e2e-fused", ["bench.py"]),
    ("4-train-step", ["bench/bench_train_step.py"]),
    ("5-dp-streaming", ["bench/bench_streaming.py"]),
    # extra evidence beyond the 5 canonical configs: full host-roundtrip
    # serving (H2D + compute + D2H of every uint8 result, pipelined)
    ("6-serve-roundtrip", ["bench/bench_streaming.py", "--serve", "--pool", "4",
                           "--trials", "3"]),
    # sparse (changed-tile) result return: same serve path, D2H ships
    # only the mask-touched 32² tiles — the bytes lever on tunnel links
    ("7-serve-sparse", ["bench/bench_streaming.py", "--serve", "--pool", "4",
                        "--sparse", "96", "--trials", "3"]),
    # alternative-encoder experiment track (SURVEY §2.1 extras): the
    # heavier aligned-Xception backbone + DeepLab-v3+ ASPP head
    ("8-seg-xception", ["bench/bench_seg_forward.py", "--backbone", "xception",
                        "--head", "deeplab"]),
]


def ensure_trained_snapshots(root: Path) -> dict:
    """Make configs 6/7 reproducible from a fresh checkout (VERDICT r3
    item 4): the serve benches load ``trained/*.msgpack`` (random-init
    segmentation marks arbitrary regions and defeats the sparse tile
    budget), but snapshots are not committed — so train them here, with
    exactly the recipe ``trained/README.md`` documents, when absent.
    Returns a provenance dict merged into the serve results."""
    trained = root / "trained"
    trained.mkdir(exist_ok=True)
    recipes = {
        "seg_synth.msgpack": [
            "-m", "text_segmentation_image_inpainting_tpu.train.run_seg",
            "--steps", "3000", "--batch-size", "8", "--image-size", "256",
            "--lr", "1e-3",
        ],
        "inpaint_synth.msgpack": [
            "-m", "text_segmentation_image_inpainting_tpu.train.run_inpaint",
            "--steps", "2000", "--batch-size", "8", "--image-size", "256",
        ],
    }
    provenance = {}
    for name, cmd in recipes.items():
        path = trained / name
        if path.exists():
            provenance[name] = "pre-existing"
            continue
        print(f"[run_all] training {name} (absent; see trained/README.md) ...",
              flush=True)
        proc = subprocess.run(
            [sys.executable] + cmd + ["--export", str(path)],
            cwd=root, capture_output=True, text=True, timeout=5400,
        )
        if proc.returncode != 0 or not path.exists():
            provenance[name] = f"train failed: {(proc.stderr or '')[-200:]}"
            print(f"[run_all] WARNING: {provenance[name]}", flush=True)
        else:
            provenance[name] = "retrained this run (recipe: trained/README.md)"
    return {"weights_provenance": provenance}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small shapes (CI smoke)")
    p.add_argument("--only", type=str, default=None, help="substring filter")
    args = p.parse_args(argv)

    root = Path(__file__).resolve().parent.parent
    out_path = root / "bench" / "results.json"
    # merge into prior results so --only refreshes one entry, not the file
    results = {}
    if out_path.exists():
        try:
            results = json.loads(out_path.read_text())
        except json.JSONDecodeError:
            results = {}
    provenance = {}
    for name, cmd in CONFIGS:
        if args.only and args.only not in name:
            continue
        extra = []
        if args.quick and name != "3-e2e-fused":
            extra = ["--size", "128"] + (["--n-batches", "4"] if "streaming" in name else [])
        if "serve" in name and not args.quick and not provenance:
            provenance = ensure_trained_snapshots(root)
        proc = subprocess.run(
            [sys.executable] + cmd + extra, cwd=root, capture_output=True, text=True,
            timeout=3600,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.strip().splitlines())
             if ln.startswith("{")),
            None,
        )
        if line:
            print(line)
            results[name] = json.loads(line)
            if "serve" in name and provenance:
                results[name].update(provenance)
        else:
            results[name] = {"error": (proc.stderr or "no output")[-300:]}
            print(json.dumps({"config": name, **results[name]}))
    out_path.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
