"""eps-mode scale envelope: the early-exit kernel at K=2048/4096.

    python -m benchmarks.eps_scale

r9's scale-envelope run (scale_envelope.json) covered the T-mode kernel
only; the eps-exit kernel carries extra VMEM scratch (r/Linv/Dsel rows,
(p + T^2 + T*p) f32 lanes) on top of the (K, block) correlation, so its
huge-K behavior under the greedy.py block/vmem ladder is a separate
question.  Public route (`batch_omp(D, X, T, eps=...)`), denoise-like
mid-difficulty data (3-sparse + noise, mean nsel ~5 at eps=0.1),
N=262144 single dispatch, best-of-3 warm, scalar-checksum sync.
"""

from __future__ import annotations

import json
import time

import numpy as np

P, T, N, EPS = 64, 16, 262144, 0.1
KS = (1024, 2048, 4096)
# noise levels: 0.02 reproduces eps_sustained's mid difficulty (mean
# nsel ~5 at K=1024); 0.12 leaves the residual floor above eps, so
# nearly every lane rides to the T cap (the hard bound of the envelope)
NOISES = {"mid": 0.02, "hard": 0.12}


def make_data(rng, K, n, noise):
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0)
    idx = rng.integers(0, K, (n, 3))
    coef = rng.standard_normal((n, 3))
    X = np.zeros((P, n))
    for j in range(3):
        X += D[:, idx[:, j]] * coef[:, j]
    X += noise * rng.standard_normal((P, n))
    X /= np.linalg.norm(X, axis=0)
    return D, X


def main():
    import jax.numpy as jnp

    from lyssandra_tpu import solvers

    rng = np.random.default_rng(0)
    out = {}
    for diff, noise in NOISES.items():
      for K in KS:
        key = f"{diff}_K{K}"
        D, X = make_data(rng, K, N, noise)
        Dj = jnp.asarray(D, jnp.float32)
        Xj = jnp.asarray(X, jnp.float32)

        def run():
            res = solvers.batch_omp(Dj, Xj, T, eps=EPS, dense=False)
            return res

        try:
            res = run()
            mean_nsel = float(np.asarray(jnp.mean(res.nsel.astype(
                jnp.float32))))
            float(np.asarray(jnp.sum(res.err)))  # warm sync
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                r = run()
                float(np.asarray(jnp.sum(r.err)))
                best = min(best, time.perf_counter() - t0)
            out[key] = {
                "patches_per_sec": round(N / best, 1),
                "seconds": round(best, 4),
                "mean_nsel": round(mean_nsel, 2),
            }
        except Exception as e:  # noqa: BLE001 — record OOM/compile fails
            out[key] = {"error": str(e)[:300]}
        print(json.dumps({key: out[key]}), flush=True)

    from benchmarks import write_result

    res = {"shape": f"p={P} T={T} eps={EPS} N={N} single dispatch,"
                    " eps-exit kernel via public batch_omp",
           "grid": out}
    print("wrote", write_result("eps_scale", res))


if __name__ == "__main__":
    main()
