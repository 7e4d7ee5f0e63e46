"""Persistent XLA compile cache, gated on the ACTUAL backend.

The remote-compile tunnel in this environment is slow/flaky; a warm cache at
/root/repo/.jax_cache makes TPU runs start in seconds instead of minutes. The
cache must never serve CPU runs: it holds CPU AOT executables compiled on a
DIFFERENT machine (incompatible CPU features — the loader warns, numerics can
diverge, SIGILL is possible). Scripts previously gated on their --cpu flag,
which breaks when TPU init fails and JAX silently falls back to CPU — so this
helper checks `jax.default_backend()` (initializing the backend, which every
caller is about to do anyway).
"""
from __future__ import annotations

__all__ = ["enable_tpu_compile_cache"]

CACHE_DIR = "/root/repo/.jax_cache"


def enable_tpu_compile_cache() -> bool:
    """Enable the persistent compile cache iff the active backend is not CPU.

    Returns True when the cache was enabled. Safe to call multiple times.
    """
    try:
        import jax

        if jax.default_backend() == "cpu":
            return False
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
