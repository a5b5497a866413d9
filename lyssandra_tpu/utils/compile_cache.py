"""Persistent-compilation-cache helper.

The framework's TPU defaults include deep fused Pallas kernels whose
Mosaic compiles cost minutes per (shape, depth) on the remote compile
helper (ab_fs_fused.json: ~24 s at feature-sign cold depth 8 rising to
~1,900 s at the depth-28 chip default), and JAX's in-memory executable
cache dies with the process.  ``enable_compile_cache`` points JAX's
persistent compilation cache at a directory so those compiles are paid
once per machine, not once per process — measured to round-trip Mosaic
kernels on the reference box (benchmarks/results/
probe_compile_cache.json).

Call it BEFORE the first jitted call (ideally right after importing
jax); an already-compiled executable is never re-serialized
retroactively.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join("~", ".cache", "lyssandra_tpu", "jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache at ``path``.

    path: cache directory (created if missing).  Default
    ``~/.cache/lyssandra_tpu/jax_cache``.  Returns the resolved path.

    Sets ``jax_persistent_cache_min_compile_time_secs`` and
    ``min_entry_size_bytes`` to 0 so even small executables round-trip —
    the target workload is a handful of very expensive kernels, not
    thousands of tiny ones, so cache-size pressure is not a concern.
    """
    import jax

    path = os.path.abspath(os.path.expanduser(path or _DEFAULT))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def cache_enabled() -> bool:
    """True if a persistent compilation cache directory is configured."""
    import jax

    return bool(jax.config.jax_compilation_cache_dir)
