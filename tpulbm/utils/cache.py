"""Persistent XLA compilation cache.

The remote TPU compile service costs seconds per executable; caching compiled
programs across processes makes repeat CLI/bench runs start in milliseconds.
Opt out with TPULBM_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("TPULBM_NO_COMPILE_CACHE"):
        return
    import jax

    if path is None:
        path = os.environ.get(
            "TPULBM_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "tpulbm", "xla"),
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a failure
