"""Persistent XLA compilation cache.

The TPU backend used in this environment compiles via a remote service
whose first-compile session setup can take minutes; a persistent on-disk
cache makes repeat runs with identical graphs skip remote compilation
entirely. Applied once, respecting any user-set cache dir.
"""
from __future__ import annotations

import os

_done = False


def enable_persistent_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        if jax.config.read("jax_compilation_cache_dir"):
            return
        cache_dir = os.environ.get(
            "PYRHE_XLA_CACHE",
            os.path.expanduser("~/.cache/pyrhe_tpu/xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
