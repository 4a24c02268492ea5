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

import hashlib
import os
import platform
import threading

import jax

# XLA:CPU debug flags that cut compile wall time ~30% on the 1-core
# dryrun host (measured round 5: seg train step 36.3 -> 25.9 s) with no
# effect on correctness tolerances. Unknown XLA flags are FATAL (abort
# in parse_flags_from_env.cc), so these are only applied on the jax
# version they were validated against — a toolchain bump degrades to
# slow-but-alive, never to a dead gate.
_FAST_CPU_COMPILE_FLAGS = (
    "--xla_backend_optimization_level=0"
    " --xla_llvm_disable_expensive_passes=true"
    " --xla_cpu_enable_concurrency_optimized_scheduler=false"
)
_FLAGS_VALIDATED_ON = "0.9."


def host_fingerprint() -> str:
    """Stable id of THIS host's CPU + jax build — keys the CPU compile
    cache so an artifact can never be loaded on a machine with different
    CPU features (the SIGILL hazard that kept earlier rounds cache-free
    applies to cross-machine reuse, not same-host reuse)."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    key = f"{jax.__version__}|{platform.machine()}|{flags}"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def enable_fast_cpu_compile(cache_root: str | None = None) -> str:
    """Speed up CPU-only entry points that are dominated by XLA compile
    time (the driver's multichip dryrun): append the validated fast-
    compile XLA flags and point the persistent compile cache at a
    host-fingerprinted directory. Both are no-ops if any backend is
    already initialized (XLA_FLAGS is read at first backend init).

    Returns a short status string for logging.
    """
    notes = []
    try:
        from jax._src import xla_bridge as xb

        live = xb.backends_are_initialized()
    except Exception:
        live = True  # can't tell -> don't touch process state
    if not live and jax.__version__.startswith(_FLAGS_VALIDATED_ON):
        existing = os.environ.get("XLA_FLAGS", "")
        for flag in _FAST_CPU_COMPILE_FLAGS.split():
            if flag.split("=")[0] not in existing:
                existing = f"{existing} {flag}".strip()
        os.environ["XLA_FLAGS"] = existing
        notes.append("fast-compile flags on")
    else:
        notes.append("fast-compile flags skipped")
    if cache_root:
        try:
            cache_dir = os.path.join(cache_root, host_fingerprint())
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            notes.append(f"cpu cache {os.path.basename(cache_dir)}")
        except Exception as e:  # cache is an optimization, never a gate
            jax.config.update("jax_compilation_cache_dir", None)
            notes.append(f"cpu cache off ({type(e).__name__})")
    return ", ".join(notes)


def install_stderr_line_filter(
    substrings: tuple[bytes, ...] = (b"cpu_aot_loader.cc",),
) -> bool:
    """Drop known-benign C++ log lines from fd 2, pass everything else.

    Every CPU compile-cache hit makes XLA's AOT loader emit two ~4 KB
    LOG(ERROR) lines about the ``+prefer-no-scatter``/``+prefer-no-gather``
    pseudo-features (compiler-internal hints, not CPUID bits, so the
    loader's compile-host == run-host feature check can never see them
    match). On the SAME host the artifact is byte-identical to a fresh
    compile — but ~30 such blocks would flood the driver's output-tail
    capture. ``TF_CPP_MIN_LOG_LEVEL`` cannot help: this environment's
    site hook pre-imports jaxlib's C extensions, so TSL's min-log-level
    latches before any repo code runs.

    The filter is a pump thread on a pipe spliced over fd 2: lines
    containing any of ``substrings`` are dropped, all other bytes are
    forwarded to the real stderr unchanged (Python tracebacks, real XLA
    errors, and abort messages still reach the driver). Returns False
    (and leaves fd 2 alone) if the splice fails for any reason.
    """
    try:
        read_fd, write_fd = os.pipe()
        real_stderr = os.dup(2)
        os.dup2(write_fd, 2)
        os.close(write_fd)
    except OSError:
        return False

    def pump():
        with os.fdopen(read_fd, "rb", buffering=0) as pipe_reader:
            buf = b""
            while True:
                chunk = pipe_reader.read(65536)
                if not chunk:
                    break
                buf += chunk
                *lines, buf = buf.split(b"\n")
                for line in lines:
                    if not any(s in line for s in substrings):
                        os.write(real_stderr, line + b"\n")
            if buf and not any(s in buf for s in substrings):
                os.write(real_stderr, buf)

    pump_thread = threading.Thread(target=pump, daemon=True, name="stderr-filter")
    pump_thread.start()

    def drain_at_exit():
        # Tracebacks print before atexit runs, so they're in the pipe by
        # now: restore the real fd 2 (EOFs the pump) and wait for the
        # pump to forward what's buffered.
        try:
            import sys

            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(real_stderr, 2)
        pump_thread.join(timeout=5)

    import atexit

    atexit.register(drain_at_exit)
    return True


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
