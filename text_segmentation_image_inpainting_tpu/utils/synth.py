"""Compile-free variable synthesis for sharding/shape tests.

``module.init`` traced under jit (or run eagerly) costs a full XLA
compile — ~30 s per model on the 1-core dryrun host, which round 4's
multichip gate paid five times over. Sharding and schedule checks don't
care where the numbers came from, only that shapes/dtypes match and the
network stays finite — so this synthesizes the variables from
``jax.eval_shape`` (pure tracing, zero compiles, ~1 s) with
collection-aware fills:

- ``params``:       0.05 * N(0,1)   (small enough to keep losses finite)
- ``batch_stats``:  mean -> 0, var -> 1 (var MUST be nonneg: eval-mode
                    BN takes sqrt(var + eps))
- ``spectral``:     N(0,1) power-iteration u/v seeds
- anything else:    zeros of the right dtype

Not for training-from-scratch (no kaiming fan-in scaling) — for that,
use the real ``module.init``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def synthesize_variables(init_fn, *example_args, seed: int = 0):
    """Variables matching ``init_fn(key, *example_args)``'s structure,
    filled host-side without compiling anything."""
    shapes = jax.eval_shape(init_fn, jax.random.key(seed), *example_args)
    rng = np.random.default_rng(seed)

    def fill(path, sd):
        keys = [p.key for p in path if hasattr(p, "key")]
        collection = keys[0] if keys else ""
        if not jnp.issubdtype(sd.dtype, jnp.floating):
            return jnp.zeros(sd.shape, sd.dtype)
        if collection == "batch_stats":
            leaf = keys[-1] if keys else ""
            const = 1.0 if "var" in leaf else 0.0
            return jnp.full(sd.shape, const, sd.dtype)
        scale = 1.0 if collection == "spectral" else 0.05
        return jnp.asarray(
            rng.standard_normal(sd.shape).astype(np.float32) * scale
        ).astype(sd.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
