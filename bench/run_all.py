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
    for name, cmd in CONFIGS:
        if args.only and args.only not in name:
            continue
        extra = []
        if args.quick and name != "3-e2e-fused":
            extra = ["--size", "128"] + (["--n-batches", "4"] if "streaming" in name else [])
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
        else:
            results[name] = {"error": (proc.stderr or "no output")[-300:]}
            print(json.dumps({"config": name, **results[name]}))
    out_path.write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
