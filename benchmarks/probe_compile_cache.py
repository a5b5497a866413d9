"""Does JAX's persistent compilation cache round-trip Mosaic kernels on
this box?  (VERDICT r4 task #2.)

Context: the TPU-default feature-sign cold start is a fused Pallas
kernel whose Mosaic compile EXPLODES with unroll depth (24 s @ 8 ...
~1,900 s @ 28, ab_fs_fused.json), and CLAUDE.md records that plain
cross-process compile caching does NOT hold on this box (same shape
recompiles from scratch in a new process).  This probe tests whether
the EXPLICIT persistent cache (jax_compilation_cache_dir) behaves
differently: phase A compiles the kernel into a cache directory, phase
B (a fresh process) times the same first call.  If B's first call costs
~runtime instead of ~compile, the 31-minute depth-28 tax is
once-per-machine and the public path can enable the cache.

    python -m benchmarks.probe_compile_cache [--depth 8] [--keep]

The parent orchestrates; each phase is its own subprocess (one TPU
process at a time — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")

_PHASE_SRC = r"""
import sys, time, json
cache_dir, depths = sys.argv[1], [int(v) for v in sys.argv[2].split(",")]
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np
import jax.numpy as jnp
from lyssandra_tpu.ops.pallas_fs import fs_cold_fused

p, K, N = 192, 1024, 2048          # config-4 panel shape, small N
rng = np.random.default_rng(0)
D = rng.standard_normal((p, K)); D /= np.linalg.norm(D, axis=0)
X = rng.standard_normal((p, N)); X /= np.linalg.norm(X, axis=0)
Dj, Xj = jnp.asarray(D, jnp.float32), jnp.asarray(X, jnp.float32)
# warm the tunnel/first-fetch on an unrelated tiny op so the timing
# below is compile+run, not the one-time host-fetch stall
float(np.asarray(jnp.sum(Dj.T @ Xj)))
out = {}
for depth in depths:
    t0 = time.perf_counter()
    o = fs_cold_fused(Dj, Xj, lam=0.15, t_unroll=depth, n_refine=2,
                      block=256)
    float(np.asarray(jnp.sum(o[4])))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = fs_cold_fused(Dj, Xj, lam=0.16, t_unroll=depth, n_refine=2,
                      block=256)        # lam is traced: same executable
    float(np.asarray(jnp.sum(o[4])))
    warm_s = time.perf_counter() - t0
    out[depth] = {"first_call_s": round(first_s, 2),
                  "warm_call_s": round(warm_s, 3)}
print(json.dumps(out))
"""


def run_phase(cache_dir: str, depths: list[int]) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _PHASE_SRC, cache_dir,
         ",".join(str(d) for d in depths)],
        capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    depths = [8, 16]
    if "--depth" in sys.argv:
        depths = [int(v) for v in
                  sys.argv[sys.argv.index("--depth") + 1].split(",")]
    keep = "--keep" in sys.argv
    if keep:
        cache_dir = os.path.join(
            os.path.dirname(RESULTS_DIR), "..", ".jax_cache")
        cache_dir = os.path.abspath(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
    else:
        cache_dir = tempfile.mkdtemp(prefix="jaxcache_probe_")

    t0 = time.perf_counter()
    a = run_phase(cache_dir, depths)
    a_wall = round(time.perf_counter() - t0, 1)
    entries = []
    for root, _dirs, files in os.walk(cache_dir):
        entries += [os.path.join(root, f) for f in files]
    t0 = time.perf_counter()
    b = run_phase(cache_dir, depths)
    b_wall = round(time.perf_counter() - t0, 1)

    # per depth: the cached path skips the Mosaic/XLA compile; the
    # RESIDUAL a fresh process still pays is jit trace + pallas
    # lowering + executable deserialization, which grows with program
    # size.  "holds" = the residual is well under the compile it skips.
    rows = {}
    for d in depths:
        ad, bd = a[str(d)], b[str(d)]
        rows[d] = {
            "phase_a": ad, "phase_b": bd,
            "compile_skipped_s": round(
                ad["first_call_s"] - bd["first_call_s"], 2),
            "holds": bd["first_call_s"] < 0.5 * ad["first_call_s"],
        }
    out = {
        "probe": "jax persistent compilation cache vs Mosaic kernels",
        "kernel": "fs_cold_fused (p=192 K=1024 N=2048), per depth",
        "depths": rows,
        "phase_a_wall_s": a_wall,
        "phase_b_wall_s": b_wall,
        "cache_entries_after_a": len(entries),
        "cache_bytes_after_a": sum(os.path.getsize(f) for f in entries),
        "cache_holds_across_processes": all(
            r["holds"] for r in rows.values()),
        "cache_dir": cache_dir if keep else "(temp, deleted)",
    }
    print(json.dumps(out, indent=1))
    from benchmarks import stamp

    with open(os.path.join(RESULTS_DIR, "probe_compile_cache.json"),
              "w") as f:
        json.dump(stamp(out), f, indent=2)
    if not keep:
        import shutil

        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
