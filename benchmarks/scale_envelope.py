"""Scale-envelope captures beyond the tuned north-star point (VERDICT
r2 task #4).

    python -m benchmarks.scale_envelope [--quick]

Everything in r1-r7 was measured at K=1024, p in {64, 192}.  This grid
probes the fused kernel's own gate boundaries:
  - K sweep (p=64, T=8): 1024 / 2048 / 4096 — the block schedule
    halves the lane block beyond K=2048 (solvers/greedy.py), and the
    (K, block) VMEM correlation is the scaling wall;
  - p sweep (K=1024, T=8): 256 / 448 / 512 — the `_fused_supported`
    gate admits p <= 512; beyond, the route falls back to the XLA scan
    (captured once for the handoff note).

Methodology: bench.py's sustained shape — one N=262k single dispatch
(quick: 65k), best-of-3 warm, scalar-checksum sync.  Writes
benchmarks/results/scale_envelope.json.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

T = 8


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _best(fn, reps=3):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _data(p, K, n, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, n)).astype(np.float32)
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    return D, X


def main(quick=False):
    import jax.numpy as jnp

    from lyssandra_tpu import solvers

    N = 65536 if quick else 262144
    res = {"N": N, "T": T, "grid": {}}

    def run_point(p, K, tag, n=None):
        n = n or N
        D, X = _data(p, K, n)
        Dj, Xj = jnp.asarray(D), jnp.asarray(X)
        t = _best(lambda: _sync(
            solvers.batch_omp(Dj, Xj, T, dense=False).err))
        res["grid"][tag] = {
            "p": p, "K": K, "N": n, "pps": round(n / t, 1),
            "ms": round(t * 1e3, 2),
        }
        print(json.dumps({tag: res["grid"][tag]}), flush=True)

    for K in (1024, 2048, 4096):
        run_point(64, K, f"K{K}_p64")
    for p in (256, 448, 512):
        run_point(p, 1024, f"K1024_p{p}")
    # one beyond-gate point: p=576 falls back to the XLA scan route.
    # Smaller N: the scan carries Dsel (N, T, p) double-buffered — at
    # N=262k/p=576 that is ~10 GB of HBM carry and risks the worker
    # (CLAUDE.md einsum-OOM lesson); 32k lanes times fine.
    run_point(576, 1024, "K1024_p576_scan_fallback", n=32768)

    print(json.dumps(res))
    from benchmarks import write_result

    print("wrote", write_result("scale_envelope", res))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
