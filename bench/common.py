"""Shared timing harness for the canonical benchmark configs.

BASELINE.md:19-25 names five configs; each ``bench/bench_*.py`` script
runs one and prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Timing rules for this environment (docs/STATUS.md): the axon-tunneled
TPU ignores ``block_until_ready``, and per-call dispatch rides the
tunnel — so K iterations run INSIDE one jit via ``lax.scan`` with a
carry-dependent input (defeats CSE) and a full-output reduction
(defeats DCE); completion is forced by one scalar host read.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

# north star: 1e3 pages/s on v5e-8 => 125 pages/s per chip (BASELINE.json:2,5)
TARGET_PAGES_PER_SEC_PER_CHIP = 125.0


def time_scan(fn: Callable, args: tuple, *, k: int = 20, reps: int = 3) -> float:
    """Seconds per single ``fn(*args)`` call, measured as K in-jit iterations.

    ``fn`` must return one or more arrays; every output is sum-reduced
    into the scan carry so nothing dead-code-eliminates, and the carry
    perturbs the first array argument so iterations can't CSE.
    """

    @jax.jit
    def run_k(*a):
        def body(carry, _):
            perturbed = (a[0] + carry * 1e-20,) + a[1:]
            out = fn(*perturbed)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in leaves)
            return s * 1e-9, None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
        return out

    float(run_k(*args))  # compile + warmup, forced sync via scalar read
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run_k(*args))
    return (time.perf_counter() - t0) / (reps * k)


def emit(metric: str, value: float, unit: str, vs_baseline: float,
         bar: float | None = None, bar_source: str | None = None, **extra) -> None:
    """One JSON result line.

    ``vs_baseline`` is ALWAYS the ratio against the north-star 125
    pages/s/chip inference share — comparable across rounds, but not a
    fair bar for non-inference configs (VERDICT r4 weak #5). Configs
    that have their own physical ceiling pass ``bar`` (pages/s) +
    ``bar_source`` and get ``vs_bar`` — the ratio that says whether the
    config is near ITS OWN attainable limit:

    - config 4 (train step): the XLA-cost-model roofline floor at the
      measured HBM bandwidth (``bench_train_step._roofline_floor_ms``);
    - configs 6/7 (serve round-trip): the measured tunnel link ceiling
      (``bench_streaming.measure_link``).
    """
    rec = {"metric": metric, "value": round(value, 2), "unit": unit,
           "vs_baseline": round(vs_baseline, 4)}
    if bar:
        rec["bar_pages_per_sec"] = round(bar, 2)
        rec["vs_bar"] = round(value / bar, 4)
        if bar_source:
            rec["bar_source"] = bar_source
    print(json.dumps({**rec, **extra}))


def emit_failure(metric: str, unit: str, err: Exception) -> None:
    print(json.dumps({"metric": metric, "value": 0.0, "unit": unit,
                      "vs_baseline": 0.0, "error": f"{type(err).__name__}: {err}"[:300]}))
