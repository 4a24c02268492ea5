"""Multi-step dispatch: run k train steps in ONE jitted call.

Each host->device dispatch on a tunnel-attached chip costs ~16 ms
(docs/KERNEL_NOTES.md round 3); a 512^2 seg step is ~34 ms of device
time, so per-step dispatch tax is material. ``make_multi_step`` wraps
any ``train_step(state, batch) -> (state, metrics)`` in a ``lax.scan``
over a leading step axis, so the driver pays one dispatch per k steps.
Semantically identical to k sequential dispatches (same XLA step
program as the scan body; state is the carry).

The reference has no analogue (its loop is one ``optimizer.step()`` per
Python iteration, SURVEY.md section 3.1); this is the TPU-idiomatic
equivalent of device-loop training.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List

import jax
import numpy as np
from jax import lax


def make_multi_step(train_step: Callable) -> Callable:
    """Wrap ``train_step(state, batch) -> (state, metrics)`` so that
    ``multi_step(state, batches)`` consumes batches whose leaves carry a
    leading step axis ``(k, ...)`` and returns ``(state, metrics)`` with
    every metric leaf stacked ``(k,)``. Jit the result (donate arg 0).
    """

    def multi_step(state, batches):
        return lax.scan(train_step, state, batches)

    return multi_step


def stack_host_batches(host_it: Iterator[Dict[str, Any]], k: int) -> Iterator[Dict[str, Any]]:
    """Group a host batch iterator into stacked ``(k, ...)`` super-batches
    (numpy, host-side — one H2D transfer feeds one multi_step dispatch)."""
    if k < 1:
        raise ValueError(f"steps per dispatch must be >= 1, got {k}")
    while True:
        group: List[Dict[str, Any]] = []
        for _ in range(k):
            try:
                group.append(next(host_it))
            except StopIteration:
                return
        yield jax.tree.map(lambda *xs: np.stack(xs), *group)


def clamp_steps_per_dispatch(k: int, *boundaries: int) -> int:
    """Largest divisor of every boundary (log/ckpt cadence) that is <= k,
    so chunked stepping always lands exactly on logging and checkpoint
    edges. Returns 1 when nothing larger divides them all."""
    k = max(1, int(k))
    for kk in range(k, 1, -1):
        if all(b % kk == 0 for b in boundaries if b):
            return kk
    return 1
