"""Tracing / profiling hooks (SURVEY.md §5).

The reference has wall-clock prints; the rebuild wraps jax.profiler traces
(Perfetto-compatible dumps) and provides a sync-aware timer that works
around this machine's tunneled backend (block_until_ready returning early —
see bench.py): synchronization is forced by fetching a scalar checksum.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Wrap a region in a jax.profiler trace; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def _sync(tree: Any) -> float:
    """Force completion of every array in the pytree; returns a checksum.

    Uses a scalar host fetch rather than block_until_ready because the
    latter returns early on the tunneled axon backend.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    s = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
    return float(np.asarray(s))


def timed(fn: Callable, *args, warmup: int = 1, reps: int = 3, **kw):
    """(result, seconds_per_call) with checksum-forced device sync."""
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kw)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        _sync(out)
    return out, (time.perf_counter() - t0) / reps
