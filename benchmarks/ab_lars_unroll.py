"""LARS unrolled cold-start chip A/B (r8, VERDICT r2 task #7).

    python -m benchmarks.ab_lars_unroll

Three regimes at the north-star dictionary shape (p=64, K=1024,
N=16384, block=2048):
  - dense: random unit-norm signals at lam=0.15 (mean nnz ~47 — the
    solver_throughput.json operating point);
  - tmode: n_nonzero_coefs=8 (the OMP-comparable stopping — path is
    ~9 events, fully covered by the unroll);
  - sparse: planted 5-sparse + noise at lam=0.15 (mean nnz ~6, the
    config-4-like difficulty).
Writes benchmarks/results/ab_lars_unroll.json.
"""

import json
import time

import numpy as np
import jax.numpy as jnp

from lyssandra_tpu.solvers.lasso import lars

LAM, BLOCK, N, P, K = 0.15, 2048, 16384, 64, 1024


def _sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def main():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0)
    Dd = jnp.asarray(D, jnp.float32)

    X = rng.standard_normal((P, N))
    X /= np.linalg.norm(X, axis=0)
    idx = rng.integers(0, K, (N, 5))
    coef = rng.standard_normal((N, 5))
    Xs = np.zeros((P, N), np.float32)
    for j in range(5):
        Xs += (D[:, idx[:, j]] * coef[:, j]).astype(np.float32)
    Xs += 0.02 * rng.standard_normal((P, N)).astype(np.float32)
    Xs /= np.linalg.norm(Xs, axis=0)

    res = {"shape": {"p": P, "K": K, "N": N, "block": BLOCK, "lam": LAM}}

    def bench(tag, Xd, **kw):
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        def run():
            return jnp.concatenate(
                [lars(Dd, b, **kw) for b in blocks], axis=1)

        _sync(run())
        best, g = np.inf, None
        for _ in range(3):
            t0 = time.perf_counter()
            g = run()
            _sync(g)
            best = min(best, time.perf_counter() - t0)
        nnz = float(np.asarray((jnp.abs(g) > 1e-8).sum(0).mean()))
        lam = kw.get("lam", 0.0)
        R = Xd - Dd @ g
        obj = float(np.asarray(
            jnp.sum(R * R, 0) + lam * jnp.sum(jnp.abs(g), 0)).mean())
        res[tag] = {"pps": round(N / best, 1), "mean_nnz": round(nnz, 2),
                    "obj_mean": obj}
        print(json.dumps({tag: res[tag]}), flush=True)

    for u in (0, 12):
        bench(f"dense_un{u}", jnp.asarray(X, jnp.float32),
              lam=LAM, cold_unroll=u)
        bench(f"tmode_un{u}", jnp.asarray(X, jnp.float32),
              n_nonzero_coefs=8, cold_unroll=u)
        bench(f"sparse_un{u}", jnp.asarray(Xs), lam=LAM, cold_unroll=u)

    from benchmarks import write_result

    print("wrote", write_result("ab_lars_unroll", res))


if __name__ == "__main__":
    main()
