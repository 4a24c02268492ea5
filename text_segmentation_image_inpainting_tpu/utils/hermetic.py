"""Hermetic CPU-only backend selection.

The axon-tunneled TPU plugin in this environment initializes whenever
ANY backend is initialized (``JAX_PLATFORMS=cpu`` does not stop it),
and during a tunnel outage that initialization hangs forever in a
C-level retry loop (docs/STATUS.md, environment gotchas) — even
``jax.devices("cpu")`` wedges. CPU-targeted entry points (the test
suite, the driver's virtual-device multichip dryrun) call
``drop_non_cpu_backends()`` BEFORE the first device access so the
process can never touch the tunnel.
"""

from __future__ import annotations

import jax


def _unavailable_backend_factory():
    raise RuntimeError(
        "backend disabled by drop_non_cpu_backends() — this process is "
        "CPU-hermetic and must never initialize a tunneled backend"
    )


def drop_non_cpu_backends() -> bool:
    """Neutralize every non-CPU PJRT backend factory.

    The factory *callable* is replaced with one that raises, but the
    registry ENTRY (the platform name) is kept: ``xla_bridge
    .known_platforms()`` is computed from ``_backend_factories.keys()``,
    and deleting the ``tpu`` entry makes every later
    ``mlir.register_lowering(..., platform='tpu')`` — run at import time
    by ``jax.experimental.pallas`` and ``jax.experimental.checkify``
    (reached via optax→chex) — raise ``NotImplementedError: unknown
    platform tpu`` (the round-3 regression, VERDICT.md Weak #1).

    Plugin auto-discovery is also marked done so ``backends()`` never
    imports the tunneled plugin module during a later device access.

    Returns True when the registry was trimmed before any backend
    initialized (the process is now CPU-hermetic), False when a backend
    was already live or the private registry moved — callers must keep
    their existing device-pinning fallback for that case.
    """
    try:
        import dataclasses

        from jax._src import xla_bridge as xb

        if xb.backends_are_initialized():
            return False
        for name, reg in list(xb._backend_factories.items()):
            if name == "cpu":
                continue
            xb._backend_factories[name] = dataclasses.replace(
                reg, factory=_unavailable_backend_factory, fail_quietly=True
            )
        # Stop backends() from discovering/importing further PJRT plugin
        # modules (the axon plugin's import path touches the tunnel).
        with xb._plugin_lock:
            xb._plugins_registered = True
        # JAX_PLATFORMS=axon is exported by this environment; the config
        # write overrides it so jax never asks for the stubbed backends.
        jax.config.update("jax_platforms", "cpu")
        return True
    except Exception:
        return False
