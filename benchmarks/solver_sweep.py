"""Throughput sweep: EVERY solver at a standard shape on the chip.

    python -m benchmarks.solver_sweep

Shape: p=64, K=1024, N=32768 (T=8 / lam=0.15 on unit-norm signals), the
north-star operating point.  Timing per bench.py discipline: warm every
buffer, dispatch blocks back-to-back, one scalar sync; best of 3.
Emits benchmarks/results/solver_throughput.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

P, K, T, N, BLOCKS = 64, 1024, 8, 32768, 4
RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def main():
    import jax.numpy as jnp

    from lyssandra_tpu import solvers

    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Dj = jnp.asarray(D, jnp.float32)
    X = rng.standard_normal((P, N * BLOCKS))
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    blocks = [
        jnp.asarray(X[:, i * N : (i + 1) * N], jnp.float32)
        for i in range(BLOCKS)
    ]
    groups = np.repeat(np.arange(K // 4), 4)        # 256 groups of 4
    from lyssandra_tpu.solvers.encoder import SparseEncoder

    _enc_lasso = SparseEncoder("lasso", {"lam": 0.15}, check_atoms=False)
    _enc_lars = SparseEncoder("lars", {"lam": 0.15}, check_atoms=False)

    solvers_to_run = {
        "batch_omp(T=8)": lambda Xb: solvers.batch_omp(
            Dj, Xb, T, dense=False).err,
        "omp_eps(T=16,eps)": lambda Xb: solvers.batch_omp(
            Dj, Xb, 16, eps=0.05, dense=False).err,
        "nn_omp(T=8)": lambda Xb: solvers.nn_omp(
            Dj, jnp.abs(Xb), T, dense=False).err,
        "group_omp(T=4,gs=4)": lambda Xb: jnp.sum(
            jnp.abs(solvers.group_omp(Dj, Xb, groups, 4)), axis=0),
        # convex routes go through the encoder: active-set solvers ride
        # each block's slowest straggler, so production blocks at the
        # measured optimum (2048, ab_fs_block.json) — a raw one-32k-lane
        # call understates the deliverable throughput ~2x
        "feature_sign(lam=.15)": lambda Xb: jnp.sum(
            jnp.abs(_enc_lasso.encode(Xb, Dj)), axis=0),
        "lars(lam=.15)": lambda Xb: jnp.sum(
            jnp.abs(_enc_lars.encode(Xb, Dj)), axis=0),
        "fista(lam=.15,300it)": lambda Xb: jnp.sum(
            jnp.abs(solvers.fista(Dj, Xb, 0.15, n_iter=300)), axis=0),
        "llc(knn=5)": lambda Xb: jnp.sum(
            jnp.abs(solvers.llc(Dj, Xb, knn=5)), axis=0),
        "threshold(soft)": lambda Xb: jnp.sum(
            jnp.abs(solvers.threshold_code(Dj, Xb, 0.02)), axis=0),
    }

    out = {}
    for name, fn in solvers_to_run.items():
        try:
            for Xb in blocks:
                float(np.asarray(jnp.sum(fn(Xb))))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                chks = [jnp.sum(fn(Xb)) for Xb in blocks]
                float(np.asarray(jnp.sum(jnp.stack(chks))))
                best = min(best, time.perf_counter() - t0)
            out[name] = round(BLOCKS * N / best, 1)
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAILED: {str(e)[:120]}"
        print(name, out[name], flush=True)

    from benchmarks import stamp
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "solver_throughput.json"),
              "w") as f:
        json.dump(stamp({"shape": f"p={P} K={K} N={N}x{BLOCKS}",
                         "patches_per_sec": out}), f, indent=2)


if __name__ == "__main__":
    main()
