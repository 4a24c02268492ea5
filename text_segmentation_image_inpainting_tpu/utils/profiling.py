"""Profiling & debugging harness (SURVEY.md section 5).

Reference has none (print/tqdm only). TPU-native equivalents:
  * ``trace(...)``: jax.profiler TensorBoard trace of XLA/Pallas kernels
  * ``timed(...)``: wall-clock timing that actually synchronizes — on
    the axon-tunneled TPU ``block_until_ready`` is unreliable, so a
    scalar host read forces completion
  * ``enable_nan_debugging()``: jax debug_nans/debug_infs flags
  * ``checked(...)``: checkify wrapper surfacing NaN/OOB errors from
    inside jit (the functional answer to "race detection / sanitizers")
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "logs/profile"):
    """TensorBoard trace context: `with trace(): run_step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree):
    """Force device completion (tunnel-safe).

    ``block_until_ready`` is unreliable on the axon-tunneled TPU, so we
    force a scalar host read instead. One leaf suffices: all leaves of a
    jit result come from the same executable, which completes as a unit.
    """
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype"):
            float(jnp.sum(x.ravel()[:1].astype(jnp.float32)))
            break
    return tree


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kwargs):
    """(mean_seconds, last_result) with proper synchronization."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        sync(out)
    return (time.perf_counter() - t0) / iters, out


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def checked(fn: Callable):
    """checkify-wrap fn so in-jit NaN/div/OOB errors surface as Python
    exceptions: `err, out = checked(step)(...); err.throw()`."""
    from jax.experimental import checkify

    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks | checkify.div_checks
    )
