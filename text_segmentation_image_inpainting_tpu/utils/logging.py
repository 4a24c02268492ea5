"""Structured step logging (SURVEY.md section 5 "Metrics / logging").

The reference logs via print/tqdm. Here: one JSONL line per log step
(machine-readable, survives redirects) + a human-readable console line.
TensorBoard scalars are written too when ``tensorboardX``/``tf`` summary
writers are importable (optional — gated, never required).
"""

from __future__ import annotations

import json
import os
import sys
import time


class MetricLogger:
    def __init__(self, name: str, log_dir: str = "logs"):
        self.name = name
        os.makedirs(log_dir, exist_ok=True)
        self._file = open(os.path.join(log_dir, f"{name}.jsonl"), "a", buffering=1)
        self._tb = None
        # TensorBoard scalars are opt-in: flax's SummaryWriter imports
        # TensorFlow, which costs ~30s and a CUDA probe on this 1-core host
        if os.environ.get("TSIITPU_TENSORBOARD"):
            try:
                from flax.metrics import tensorboard  # type: ignore

                self._tb = tensorboard.SummaryWriter(os.path.join(log_dir, "tb", name))
            except Exception:
                pass

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in metrics.items()}}
        self._file.write(json.dumps(rec) + "\n")
        pretty = " ".join(f"{k}={v:.4g}" for k, v in rec.items() if k not in ("time",))
        print(f"[{self.name}] {pretty}", file=sys.stderr)
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.scalar(f"{self.name}/{k}", float(v), step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
