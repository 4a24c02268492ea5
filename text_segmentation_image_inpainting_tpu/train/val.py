"""Held-out validation helpers for the training CLIs.

The reference logs train-batch losses only (SURVEY.md C11 [R]); scoring
quality metrics on the batch the step just trained on flatters the
curve. These helpers materialize a small FIXED validation set from a
seed stream disjoint from training (same synthesis/decode path, seed
offset) and score it every log window — the JSONL curves then carry
honest ``val_*`` series next to the train-loss terms.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from text_segmentation_image_inpainting_tpu.data.pipeline import make_dataset
from text_segmentation_image_inpainting_tpu.parallel import shard_batch


def make_val_batches(
    kind: str, cfg, mesh, *, seed: int, n: int, paths: Optional[Sequence[str]] = None
) -> List[dict]:
    """n deterministic device-resident batches from a disjoint seed
    stream (empty list when n == 0 — caller falls back to in-batch)."""
    if n <= 0:
        return []
    it = make_dataset(
        kind, batch_size=cfg.batch_size, size=cfg.image_size, seed=seed, paths=paths
    )
    return [shard_batch(mesh, next(it)) for _ in range(n)]


def scored_eval(
    eval_step, state, batches: Sequence[dict], *, prefix: str = "val_"
) -> Dict[str, float]:
    """Mean eval metrics over ``batches``, keys prefixed (pass
    ``prefix=''`` for the legacy in-batch fallback names)."""
    acc: Dict[str, List[float]] = {}
    for b in batches:
        for k, v in eval_step(state, b).items():
            acc.setdefault(k, []).append(float(v))
    return {prefix + k: sum(v) / len(v) for k, v in acc.items()}
