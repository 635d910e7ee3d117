"""Persistent XLA compilation cache for the chip-facing entry points.

Compiles through this box's remote-TPU tunnel take 30 s – several minutes
(CLAUDE.md environment quirks); the serving boot alone pays ~4–5 min of
model compiles.  JAX's persistent compilation cache turns every repeat
boot/run into a disk hit — but on this box it MUST be enabled through
``jax.config`` (jax is pre-imported at interpreter startup, so the
``JAX_COMPILATION_CACHE_DIR`` env var is read too late for the importing
process; it still matters for subprocesses, so we set both).

The reference has no equivalent concern (torch eager, no compile step).
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compile cache at ``cache_dir``
    (default: ``$SOD_COMPILATION_CACHE_DIR`` or ``~/.cache/sod_tpu_xla``).

    Returns the directory in use, or None when the cache could not be
    enabled (never fatal — a cold compile is slow, not wrong).
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("SOD_COMPILATION_CACHE_DIR")
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/sod_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the tunnel's constant per-compile
        # round trips dominate, not local codegen time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # subprocesses (fresh interpreters) pick the env var up in time —
        # set unconditionally so they use THE SAME directory as this
        # process even when a different JAX_COMPILATION_CACHE_DIR was
        # already exported
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        # ...and the min-compile-time knob with it: a subprocess that
        # only inherits the dir would keep JAX's 1 s default and never
        # persist exactly the small programs whose constant tunnel
        # round trips this cache exists to remove
        os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        return cache_dir
    except Exception as e:  # pragma: no cover - depends on jax build
        import warnings

        warnings.warn(f"compilation cache disabled: {e}")
        return None
