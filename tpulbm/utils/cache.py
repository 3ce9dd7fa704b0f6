"""Persistent XLA compilation cache (opt-in).

Measured on the tunneled TPU platform: enabling the cache makes runs *slower*
(66 s vs 5 s on the 256x256 deck — executable serialization stalls against
the remote-compile service), so it is OFF unless TPULBM_COMPILE_CACHE points
at a directory. Kept because on standard TPU VMs the cache saves seconds of
compile per run.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if path is None:
        path = os.environ.get("TPULBM_COMPILE_CACHE")
    if not path:
        return  # opt-in only; see module docstring
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a failure
