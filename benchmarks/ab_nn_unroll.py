"""A/B the unrolled-step nn_omp (growing-dimension masked-CG solves)
vs the lax.scan form, through the PUBLIC route (solvers.greedy.nn_omp),
at the sweep shape (p=64, K=1024, T=8, N=32k).

The scan form pays nnls_rounds*(T+2) = 40 batched (N, T, T) CG matvecs
per pursuit step regardless of the true active dimension; the unrolled
form sizes step t's solve to (t+2) iterations on (N, t+1, t+1) and
makes step 0 closed-form — ~180 growing einsums vs 320 full-size ones.

Timing discipline per CLAUDE.md: warm both variants, then best-of-R
wall-clock around `reps` back-to-back dispatches with ONE final
checksum fetch.  Writes benchmarks/results/ab_nn_unroll.json.
"""

import json
import pathlib
import time

import numpy as np

import jax.numpy as jnp

from lyssandra_tpu.solvers.greedy import nn_omp


def _sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def time_variant(fn, reps=5, rounds=3):
    _sync(fn())                      # warm (compile + first-fetch stall)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    p, K, N, T = 64, 1024, 32768, 8
    rng = np.random.default_rng(0)
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = np.abs(rng.standard_normal((p, N))).astype(np.float32)
    Dd = jnp.asarray(D)
    Xd = jnp.asarray(X)

    t_scan = time_variant(
        lambda: nn_omp(Dd, Xd, T, dense=False, unroll=False).gamma
    )
    t_unroll = time_variant(
        lambda: nn_omp(Dd, Xd, T, dense=False, unroll=True).gamma
    )

    a = nn_omp(Dd, Xd, T, unroll=False)
    b = nn_omp(Dd, Xd, T, unroll=True)
    dg = float(jnp.max(jnp.abs(a - b)))

    out = {
        "shape": f"p={p} K={K} N={N} T={T}",
        "scan_s": round(t_scan, 4),
        "unroll_s": round(t_unroll, 4),
        "scan_patches_per_sec": round(N / t_scan, 1),
        "unroll_patches_per_sec": round(N / t_unroll, 1),
        "speedup": round(t_scan / t_unroll, 3),
        "max_abs_dgamma": dg,
    }
    print(json.dumps(out, indent=2))
    res = pathlib.Path(__file__).parent / "results" / "ab_nn_unroll.json"
    res.write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
