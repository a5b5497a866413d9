"""A/B the LLC constrained solve as unrolled CG vs batched LU
(jnp.linalg.solve), at the sweep shape (p=64, K=1024, knn=5, N=32k).

Tiny batched LAPACK is a TPU anti-pattern (CLAUDE.md: (32k, 8, 8) SPD
solve 0.67 ms as CG einsum matvecs vs 69 ms via LU); Creg is SPD so
knn+2 unrolled CG iterations are exact.  The LU variant here is the
pre-r8 production path, inlined for the A/B.

Writes benchmarks/results/ab_llc_cg.json.
"""

import functools
import json
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.solvers.llc import llc

_HI = lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("knn",))
def llc_lu(D, X, knn=5, lam=1e-4):
    p, K = D.shape
    N = X.shape[1]
    sim = jnp.matmul(X.T, D, precision=_HI)
    _, idx = lax.top_k(sim, knn)
    B = jnp.take(D.T, idx, axis=0)
    z = B - X.T[:, None, :]
    C = jnp.einsum("nkp,nlp->nkl", z, z, precision=_HI)
    tr = jnp.trace(C, axis1=1, axis2=2)
    Creg = C + (lam * tr + 1e-12)[:, None, None] * jnp.eye(
        knn, dtype=C.dtype
    )
    ones = jnp.ones((N, knn, 1), C.dtype)
    c = jnp.linalg.solve(Creg, ones)[..., 0]
    return c / jnp.sum(c, axis=1, keepdims=True)


def _sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def time_variant(fn, reps=5, rounds=3):
    _sync(fn())
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
    p, K, N, knn = 64, 1024, 32768, 5
    rng = np.random.default_rng(0)
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    Dd, Xd = jnp.asarray(D), jnp.asarray(X)

    t_lu = time_variant(lambda: llc_lu(Dd, Xd, knn))
    t_cg = time_variant(lambda: llc(Dd, Xd, knn, dense=False)[1])
    a = np.asarray(llc_lu(Dd, Xd, knn))
    b = np.asarray(llc(Dd, Xd, knn, dense=False)[1])

    out = {
        "shape": f"p={p} K={K} N={N} knn={knn}",
        "lu_s": round(t_lu, 4),
        "cg_s": round(t_cg, 4),
        "lu_patches_per_sec": round(N / t_lu, 1),
        "cg_patches_per_sec": round(N / t_cg, 1),
        "speedup": round(t_lu / t_cg, 3),
        "max_abs_dcoeff": float(np.abs(a - b).max()),
    }
    print(json.dumps(out, indent=2))
    res = pathlib.Path(__file__).parent / "results" / "ab_llc_cg.json"
    res.write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
