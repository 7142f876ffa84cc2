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
    _install_write_optout()
    install_serial_compiles()
    return path


_compile_lock = None   # RLock serializing pjit compiles (CPU backend)


def install_serial_compiles() -> None:
    """Serialize pjit COMPILES process-wide on the CPU backend.

    jaxlib 0.9.0's CPU PJRT client is not compile-thread-safe: with two
    threads inside `pxla.MeshComputation.compile` at once the process
    segfaults — observed repeatedly in the online soak (one thread in
    `backend_compile_and_load`, the crashing one reading
    `get_out_shardings_from_executable` off its own just-built executable,
    i.e. the concurrent load corrupts state a finished compile still
    reads). Instance-level app locks cannot close this: ANY two threads
    compiling anything can collide (the soak runs two SLAM systems — the
    driver's and FusionSystem's internal Map2DWithSLAM — whose mapper
    workers and track threads all compile KF-count-shaped pose-graph
    programs).

    The wrapper holds a global RLock around `MeshComputation.compile`,
    which runs only on executable-cache MISSES — steady-state dispatches
    never touch it, so nothing is serialized but the compiles themselves.
    TPU compiles stay unserialized (crash never observed there; compile
    latency over the tunnel matters at warmup). Idempotent."""
    import threading

    global _compile_lock
    if _compile_lock is None:
        _compile_lock = threading.RLock()

    import jax
    from jax._src.interpreters import pxla

    if getattr(pxla.MeshComputation.compile, "_pislam_serial", False):
        return
    _orig = pxla.MeshComputation.compile

    def _compile(self, *args, **kwargs):
        if jax.default_backend() == "cpu":
            with _compile_lock:
                return _orig(self, *args, **kwargs)
        return _orig(self, *args, **kwargs)

    _compile._pislam_serial = True
    pxla.MeshComputation.compile = _compile


_tls = None   # threading.local carrying the per-thread write-skip flag


def no_compile_cache():
    """Thread-local context that opts a compile OUT of the persistent
    cache's disk WRITE.

    PJRT's `executable.serialize()` intermittently segfaults on this jaxlib
    (0.9.0, CPU backend) while writing the cache entry for the mapper's
    GPS-fitting pose-graph program (jax/_src/compilation_cache.py:265) —
    observed 4/4 soak-tier runs, same call site, not reproducible in a
    fresh process with identical shapes, so it is process-state dependent
    and cannot be guarded against directly. Those pose-graph shapes vary
    with the live keyframe count anyway, so their cache hit value is low;
    the fix is to skip the serialize+write for exactly that compile.

    (jax's own `enable_compilation_cache` config flag cannot express this:
    `compilation_cache.is_cache_used` latches its verdict process-globally
    at the FIRST compile, so a scoped flag flip after that is ignored —
    hence the `put_executable_and_time` wrapper installed by
    `enable_persistent_cache`. Cache READS stay enabled either way.)
    """
    import contextlib
    import threading

    global _tls
    if _tls is None:
        _tls = threading.local()

    @contextlib.contextmanager
    def _ctx():
        prev = getattr(_tls, "skip_write", False)
        _tls.skip_write = True
        try:
            yield
        finally:
            _tls.skip_write = prev

    return _ctx()


def _install_write_optout() -> None:
    """Wrap jax's cache-write entry point to honor `no_compile_cache()`.

    The wrapper is pass-through unless the CURRENT thread is inside a
    `no_compile_cache()` scope (compiles run synchronously on the calling
    thread, so the thread-local flag correctly scopes the skip).
    Idempotent."""
    from jax._src import compilation_cache as _cc

    if getattr(_cc.put_executable_and_time, "_pislam_optout", False):
        return
    _orig = _cc.put_executable_and_time

    def _put(*args, **kwargs):
        if _tls is not None and getattr(_tls, "skip_write", False):
            # the crash is specific to the CPU PJRT serializer; TPU (and
            # any other backend's) executables keep caching even in-scope
            backend = kwargs.get("backend", args[3] if len(args) > 3
                                 else None)
            if backend is None or backend.platform == "cpu":
                return None
        return _orig(*args, **kwargs)

    _put._pislam_optout = True
    _cc.put_executable_and_time = _put
