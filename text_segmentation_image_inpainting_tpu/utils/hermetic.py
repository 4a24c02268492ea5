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


def drop_non_cpu_backends() -> bool:
    """Deregister every non-CPU PJRT backend factory.

    Returns True when the registry was trimmed before any backend
    initialized (the process is now CPU-hermetic), False when a backend
    was already live or the private registry moved — callers must keep
    their existing device-pinning fallback for that case.
    """
    try:
        from jax._src import xla_bridge as xb

        if xb.backends_are_initialized():
            return False
        for name in [n for n in xb._backend_factories if n != "cpu"]:
            del xb._backend_factories[name]
        # JAX_PLATFORMS=axon is exported by this environment; the config
        # write overrides it so jax never asks for the dropped backend.
        jax.config.update("jax_platforms", "cpu")
        return True
    except Exception:
        return False
