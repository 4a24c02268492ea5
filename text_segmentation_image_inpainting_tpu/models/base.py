"""Model-level utilities — the reference's ``BaseModule`` capabilities.

The reference's ``models/BaseModels.py`` (SURVEY.md C1) provides
checkpoint save/load with *tolerant* partial ``state_dict`` loading
(shape-matched keys only, skip+warn — lets pretrained encoder weights
load into variant decoders), and parameter counting. JAX models are
pure pytrees, so these become pytree utilities rather than a base class.
Full training checkpoints use Orbax (``train/checkpoint.py``); these
helpers cover the reference's lightweight single-file model snapshot
workflow.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization, traverse_util

logger = logging.getLogger(__name__)

PyTree = Any


def total_parameters(params: PyTree) -> int:
    """Number of scalar parameters in a params pytree (C1 parity)."""
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def tolerant_merge(target: PyTree, loaded: Mapping, *, prefix: str = "") -> Tuple[PyTree, dict]:
    """Merge ``loaded`` into ``target``, keeping only shape-matched keys.

    Reproduces the reference's tolerant ``load_state_dict`` semantics
    (SURVEY.md section 3.4): for every path in ``loaded`` that exists in
    ``target`` with the same shape, take the loaded value; otherwise keep
    the target's value and warn. Returns (merged, report) where report
    maps 'used' / 'skipped_shape' / 'skipped_missing' / 'unfilled' to
    lists of dotted paths.
    """
    tgt_flat = traverse_util.flatten_dict(target, sep="/")
    src_flat = traverse_util.flatten_dict(dict(loaded), sep="/")
    report = {"used": [], "skipped_shape": [], "skipped_missing": [], "unfilled": []}
    merged = dict(tgt_flat)
    for k, v in src_flat.items():
        key = prefix + k
        if key not in tgt_flat:
            report["skipped_missing"].append(key)
            continue
        tv = tgt_flat[key]
        if tuple(np.shape(v)) != tuple(np.shape(tv)):
            logger.warning(
                "tolerant_merge: shape mismatch at %s: loaded %s vs model %s — skipped",
                key, np.shape(v), np.shape(tv),
            )
            report["skipped_shape"].append(key)
            continue
        merged[key] = jnp.asarray(v, dtype=tv.dtype) if hasattr(tv, "dtype") else v
        report["used"].append(key)
    for k in tgt_flat:
        if k not in src_flat:
            report["unfilled"].append(k)
    # A checkpoint whose key layout doesn't match at all would otherwise
    # silently return the (random-init) template — make that loud.
    if src_flat and not report["used"]:
        logger.warning(
            "tolerant_merge: NO keys matched (%d loaded, %d skipped-missing) — "
            "the merged tree is the template unchanged; wrong checkpoint layout?",
            len(src_flat), len(report["skipped_missing"]),
        )
    elif src_flat and len(report["used"]) < len(src_flat) // 2:
        logger.warning(
            "tolerant_merge: only %d/%d loaded keys matched "
            "(%d skipped-missing, %d skipped-shape)",
            len(report["used"]), len(src_flat),
            len(report["skipped_missing"]), len(report["skipped_shape"]),
        )
    return traverse_util.unflatten_dict(merged, sep="/"), report


def save_model(path: str, variables: PyTree) -> None:
    """Single-file model snapshot (msgpack), the ``BaseModule.save`` analogue."""
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))


def load_model(path: str, template: PyTree, *, tolerant: bool = True) -> PyTree:
    """Load a snapshot; with ``tolerant=True``, shape-mismatched or missing
    entries fall back to ``template`` values (reference C1 behavior)."""
    with open(path, "rb") as f:
        raw = f.read()
    if not tolerant:
        return serialization.from_bytes(template, raw)
    state_dict = serialization.msgpack_restore(raw)
    merged, report = tolerant_merge(template, state_dict)
    if report["skipped_shape"] or report["skipped_missing"]:
        logger.warning(
            "load_model: used %d, skipped %d (shape) / %d (missing)",
            len(report["used"]), len(report["skipped_shape"]), len(report["skipped_missing"]),
        )
    return merged
