"""Profiling hooks.

TPU-native equivalent of the reference's two profiling generations (TAU flat
profiles and Intel ITAC `MPI_Pcontrol(±1,"mainloop")` brackets,
d2q9-bgk.c:275-277,404-406): a `jax.profiler` trace scoped to the step loop,
viewable in xprof/TensorBoard.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def trace_region(name: str, trace_dir: Optional[str] = None):
    """Scope a named trace region; if trace_dir is set, capture a full
    profiler trace of the region (the `make profile` equivalent)."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield
