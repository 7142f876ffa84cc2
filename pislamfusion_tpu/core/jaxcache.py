"""Persistent XLA compilation cache.

The reference is an ahead-of-time-compiled C++ binary; our per-program XLA
compiles (20-60 s each over the TPU tunnel on the build box) are the closest
thing to its build step. Enabling JAX's persistent compilation cache makes
them a one-time cost per program signature: every later process start (CLI
runs, bench.py, the driver's artifacts) deserializes the compiled executable
in milliseconds instead of recompiling.

Opt-out with PISLAM_JAX_CACHE=0; override the directory with
PISLAM_JAX_CACHE=/path.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/pislamfusion_xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a durable directory.

    Safe to call multiple times and before/after backend init (the flag is
    read at compile time). Returns the cache dir, or None when disabled.
    """
    env = os.environ.get("PISLAM_JAX_CACHE", "")
    if env == "0":
        return None
    path = path or (env if env not in ("", "1") else _DEFAULT_DIR)
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # everything here is worth caching: even "fast" compiles cost a
        # round trip on a tunneled backend
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # read-only fs / older jax: best effort
        return None
    return path
