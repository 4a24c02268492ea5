"""Microbatched gradient accumulation.

Splits one batch into ``k`` microbatches, runs the loss/grad on each
inside a ``lax.scan`` (mutable collections — BN stats, spectral u/v —
thread sequentially, exactly as k small forward passes would), and
returns the microbatch-MEAN gradients and loss terms for ONE optimizer
update. Standard accumulation semantics: normalization layers see
per-microbatch batch statistics, so a k-way accumulated step equals the
big-batch step exactly only when the microbatches are statistically
interchangeable (the regression test uses duplicated halves, where the
equality is exact).

The reference has no analogue (single-GPU, batch-sized steps only);
this is the piece that lets ``remat='full'`` configs train page sizes /
batch sizes whose activations exceed HBM (docs/KERNEL_NOTES.md round 3
measured remat trading ~40% step time for the memory).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax import lax


def accumulate_grads(
    grad_fn: Callable,
    params: Any,
    aux: Dict[str, Any],
    batch: Any,
    k: int,
):
    """Mean grads/terms over ``k`` microbatches of ``batch``.

    ``grad_fn(params, aux, microbatch)`` must return
    ``((loss, (terms, updates)), grads)`` — i.e. the output of
    ``jax.value_and_grad(loss_fn, has_aux=True)`` — where ``updates``
    is a dict holding new values for (a subset of) the keys in ``aux``
    (mutable collections; ``None`` values pass through untouched).

    Returns ``(grads, terms, aux_out)`` with grads/terms averaged and
    ``aux_out`` carrying the final threaded collections.
    """
    if k < 1:
        raise ValueError(f"grad_accum must be >= 1, got {k}")
    n = jax.tree.leaves(batch)[0].shape[0]
    if n % k != 0:
        raise ValueError(f"batch size {n} not divisible by grad_accum {k}")
    # STRIDED split (microbatch j = samples [j, k+j, 2k+j, ...]) rather
    # than contiguous (k, n/k) reshape: under DP the batch axis is
    # sharded over the device mesh, and a contiguous microbatch lives on
    # a device SUBSET — GSPMD then reshards (or idles devices) on every
    # scan iteration. The strided view keeps each microbatch spanning
    # all devices evenly, so each grad_fn call is a full-width DP step.
    micro = jax.tree.map(
        lambda x: x.reshape((n // k, k) + x.shape[1:]).swapaxes(0, 1), batch
    )
    mb0 = jax.tree.map(lambda x: x[0], micro)
    (_, (terms_shape, _)), grads_shape = jax.eval_shape(grad_fn, params, aux, mb0)

    def _zeros(tree):
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)

    def body(carry, mb):
        aux_c, gacc, tacc = carry
        (_, (terms, updates)), grads = grad_fn(params, aux_c, mb)
        aux_n = {
            key: (updates.get(key, aux_c[key]) if aux_c[key] is not None else None)
            for key in aux_c
        }
        return (
            aux_n,
            jax.tree.map(jnp.add, gacc, grads),
            jax.tree.map(jnp.add, tacc, terms),
        ), None

    (aux_out, gsum, tsum), _ = lax.scan(
        body, (dict(aux), _zeros(grads_shape), _zeros(terms_shape)), micro
    )
    inv = 1.0 / k
    grads = jax.tree.map(lambda g: g * inv, gsum)
    terms = jax.tree.map(lambda t: t * inv, tsum)
    return grads, terms, aux_out
