"""Persistent XLA compilation cache.

The reference pays its build cost once at `make` time (build/Makefile); the
JAX analogue is the XLA compile, which is paid per *process* — and over a
remote-compile TPU tunnel a large loader/stepper program can take minutes.
Enabling JAX's persistent compilation cache makes every later process with
the same program shapes start in milliseconds, which is the TPU-native
equivalent of the reference's incremental rebuild.

Called by the CLI driver (run.py), bench.py, and Simulation; a library user
who wants a different policy can simply set the jax.config knobs before
constructing a Simulation (this helper never overrides an explicit setting).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable the on-disk XLA compile cache.

    Resolution order: explicit `path` argument, then the standard
    JAX_COMPILATION_CACHE_DIR env var (left to jax itself), then a
    `.jax_cache/` directory next to the package.  Returns the directory in
    use, or None if disabled via PIC1DP_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("PIC1DP_NO_COMPILE_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:  # already configured (env var or user code) — respect it
        return current
    cache_dir = path or _DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile that takes >1s: over the remote-compile tunnel
    # even medium programs cost minutes, and disk is cheap
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
