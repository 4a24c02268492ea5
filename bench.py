"""Headline benchmark: fused end-to-end 512^2 pages/sec on one chip.

Runs BASELINE.json config 3 (segment -> mask dilation -> partial-conv
inpaint, batch=8, bf16) on the real TPU and prints ONE JSON line.
``vs_baseline`` is measured pages/sec/chip over the north-star's
per-chip share (1e3 pages/sec on v5e-8 => 125 pages/sec/chip,
BASELINE.json:2,5).

Timing notes (this environment): ``block_until_ready`` does not
actually block on the axon-tunneled TPU, and per-call dispatch rides a
network tunnel — so the K timing iterations run INSIDE one jit via
``lax.scan`` (carry-dependent inputs prevent CSE) and completion is
forced by reading one scalar back to host.
"""

from __future__ import annotations

import json
import threading
import time

import os

import jax

os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"), exist_ok=True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np
from jax import lax

BATCH = 8  # headline batch (latency-sized); --batch 32 = saturated point
SIZE = 512
K = 20  # pipeline iterations per timed call
TARGET_PAGES_PER_SEC_PER_CHIP = 125.0


_emit_lock = threading.Lock()
_emitted = False


def _emit_once(record: dict) -> bool:
    """Print exactly ONE JSON record per process, atomically.

    Main and the watchdog race near the deadline: without this
    test-and-set a run that finishes around BENCH_WATCHDOG_S could print
    BOTH the failure and the success record (and exit 2 despite having
    completed). Whoever claims the flag first prints; the loser is a
    no-op."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return False
        _emitted = True
    print(json.dumps(record), flush=True)
    return True


def _arm_watchdog(seconds: float) -> threading.Event:
    """Emit the parseable failure record and hard-exit if the run wedges.

    During an axon-tunnel outage any backend init hangs forever in a
    C-level retry loop (docs/STATUS.md gotchas) — uninterruptible from
    Python — so without this the driver's bench run would hang instead
    of recording an error. The deadline must cover a cold remote-AOT
    compile (minutes); override via BENCH_WATCHDOG_S.
    """
    done = threading.Event()

    def _fire():
        if not done.wait(seconds):
            fired = _emit_once(
                {
                    "metric": "fused_segment_dilate_inpaint_512px_pages_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "pages/s",
                    "vs_baseline": 0.0,
                    "error": (
                        f"watchdog: no result within {seconds:.0f}s "
                        "(axon tunnel down or compile wedged)"
                    ),
                }
            )
            if fired:
                os._exit(2)

    threading.Thread(target=_fire, daemon=True).start()
    return done


def main(batch: int = BATCH):
    from text_segmentation_image_inpainting_tpu.pipeline import TextRemovalPipeline

    watchdog_done = _arm_watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "1500")))

    pipe = TextRemovalPipeline()
    seg_vars, unet_vars = pipe.init_variables(jax.random.key(0), page_hw=(SIZE, SIZE))
    pages = jnp.asarray(
        np.random.default_rng(0).random((batch, SIZE, SIZE, 3), dtype=np.float32)
    )

    @jax.jit
    def run_k(seg_vars, unet_vars, pages):
        def body(carry, _):
            # carry-dependent input defeats CSE across iterations
            p = pages + carry * 1e-20
            clean, mask = pipe.run(seg_vars, unet_vars, p)
            # reduce over the FULL outputs so nothing dead-code-eliminates
            s = jnp.sum(clean.astype(jnp.float32)) + jnp.sum(mask.astype(jnp.float32))
            return s * 1e-9, None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return out

    # compile + warmup (forced sync via scalar read)
    float(run_k(seg_vars, unet_vars, pages))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s = float(run_k(seg_vars, unet_vars, pages))
    dt = (time.perf_counter() - t0) / reps
    pages_per_sec = BATCH * K / dt

    watchdog_done.set()
    _emit_once(
        {
            "metric": "fused_segment_dilate_inpaint_512px_pages_per_sec_per_chip",
            "value": round(pages_per_sec, 2),
            "unit": "pages/s",
            "vs_baseline": round(pages_per_sec / TARGET_PAGES_PER_SEC_PER_CHIP, 4),
        }
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # still emit a parseable record on failure
        _emit_once(
            {
                "metric": "fused_segment_dilate_inpaint_512px_pages_per_sec_per_chip",
                "value": 0.0,
                "unit": "pages/s",
                "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:300],
            }
        )
        raise
