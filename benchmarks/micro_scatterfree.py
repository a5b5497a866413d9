"""Chip microbenchmark: scatter vs fused compare-reduce / gathered-atom
residual for the feature-sign outer-step bookkeeping ops.

profile_fs.json coherent_floor measured the three per-outer (N, K)
scatters (is_active x2, dense x1) at ~8.9 ms of the ~20.7 ms actual
per-outer wall at 2048 lanes.  This A/Bs the scatter-free forms before
committing the solver rewrite:

  is_active:  zeros.at[rows, idx].max(mask)
          vs  any(idx[:,:,None] == arange(K), axis=1)  (fused reduce)
  grad path:  dense-scatter (N,K) -> (N,K)x(K,p) matmul residual
          vs  einsum("na,nap->np", gact, Dact) residual (Dact already
              gathered for the active-set Gram)

    python -m benchmarks.micro_scatterfree
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPS = 50


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _best_of(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST
    N, A, K, p = 2048, 64, 1024, 192
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, K, (N, A)), jnp.int32)
    mask = jnp.asarray(rng.random((N, A)) > 0.3)
    gact = jnp.asarray(rng.standard_normal((N, A)), jnp.float32)
    gact = jnp.where(mask, gact, 0.0)
    Dt = jnp.asarray(rng.standard_normal((K, p)), jnp.float32)
    Xt = jnp.asarray(rng.standard_normal((N, p)), jnp.float32)
    Dact = jnp.take(Dt, idx, axis=0)
    rows = jnp.arange(N)[:, None]

    def repeat_ms(fn, x0):
        f = jax.jit(
            lambda x: jax.lax.scan(
                lambda c, _: (fn(c), None), x, None, length=REPS
            )[0]
        )
        _sync(f(x0))
        return 1e3 * _best_of(lambda: _sync(f(x0))) / REPS

    # consumers: row-sum broadcast keeps the dependence without adding a
    # per-lane gather (take_along_axis is ITSELF latency-bound — probe it
    # separately below)
    def _consume(ga, z):
        return ga + 1e-6 * jnp.sum(z.astype(jnp.float32), axis=1,
                                   keepdims=True)

    # --- is_active -----------------------------------------------------
    def isact_scatter(ga):
        z = jnp.zeros((N, K), bool).at[rows, idx].max(mask & (ga > 0))
        return _consume(ga, z)

    def isact_reduce(ga):
        kk = jnp.arange(K, dtype=idx.dtype)[None, None, :]
        z = jnp.any(
            (idx[:, :, None] == kk) & (mask & (ga > 0))[:, :, None],
            axis=1,
        )
        return _consume(ga, z)

    LO = 128

    def isact_split_mm(ga):
        # split k = hi*LO + lo: one-hot membership becomes a batched MXU
        # matmul (N, A, K//LO) x (N, A, LO) -> (N, K//LO, LO)
        hi = (idx // LO)[:, :, None] == jnp.arange(K // LO)[None, None, :]
        lo = (idx % LO)[:, :, None] == jnp.arange(LO)[None, None, :]
        m = (mask & (ga > 0)).astype(jnp.float32)
        cnt = jnp.einsum("nah,nal->nhl",
                         hi.astype(jnp.float32) * m[:, :, None],
                         lo.astype(jnp.float32), precision=HI)
        z = cnt.reshape(N, K) > 0.5
        return _consume(ga, z)

    # --- gradient path ---------------------------------------------------
    def grad_dense(ga):
        z = jnp.zeros((N, K), jnp.float32)
        gfull = z.at[rows, idx].add(jnp.where(mask, ga, 0.0))
        R = jnp.matmul(gfull, Dt, precision=HI) - Xt
        gr = 2.0 * jnp.matmul(R, Dt.T, precision=HI)
        return _consume(ga, gr)

    def grad_gathered(ga):
        R = jnp.einsum("na,nap->np", jnp.where(mask, ga, 0.0), Dact,
                       precision=HI) - Xt
        gr = 2.0 * jnp.matmul(R, Dt.T, precision=HI)
        return _consume(ga, gr)

    def gather_only(ga):
        return ga + 1e-6 * jnp.take_along_axis(
            jnp.zeros((N, K), jnp.float32) + ga[:, :1], idx, axis=1)

    # single-column per-lane gathers as they appear in the solver loops:
    # gr_at = gr[n, k[n]] (outer_step activation), tbest = ts[n, best[n]]
    # (inner_step line search, paid up to max_inner times per outer)
    kcol = idx[:, 0]

    def grat_gather(ga):
        gr = jnp.zeros((N, K), jnp.float32) + ga[:, :1]
        v = jnp.take_along_axis(gr, kcol[:, None], axis=1)[:, 0]
        return ga + 1e-6 * v[:, None]

    def grat_onehot(ga):
        gr = jnp.zeros((N, K), jnp.float32) + ga[:, :1]
        kk = jnp.arange(K, dtype=kcol.dtype)[None, :]
        v = jnp.sum(jnp.where(kk == kcol[:, None], gr, 0.0), axis=1)
        return ga + 1e-6 * v[:, None]

    bcol = idx[:, 1] % (A + 1)

    def tbest_gather(ga):
        ts = jnp.zeros((N, A + 1), jnp.float32) + ga[:, :1]
        v = jnp.take_along_axis(ts, bcol[:, None], axis=1)[:, 0]
        return ga + 1e-6 * v[:, None]

    def tbest_onehot(ga):
        ts = jnp.zeros((N, A + 1), jnp.float32) + ga[:, :1]
        aa = jnp.arange(A + 1, dtype=bcol.dtype)[None, :]
        v = jnp.sum(jnp.where(aa == bcol[:, None], ts, 0.0), axis=1)
        return ga + 1e-6 * v[:, None]

    out = {
        "shape": dict(N=N, A=A, K=K, p=p),
        "isact_scatter_ms": repeat_ms(isact_scatter, gact),
        "isact_reduce_ms": repeat_ms(isact_reduce, gact),
        "isact_split_mm_ms": repeat_ms(isact_split_mm, gact),
        "grad_dense_ms": repeat_ms(grad_dense, gact),
        "grad_gathered_ms": repeat_ms(grad_gathered, gact),
        "take_along_axis_ms": repeat_ms(gather_only, gact),
        "grat_gather_ms": repeat_ms(grat_gather, gact),
        "grat_onehot_ms": repeat_ms(grat_onehot, gact),
        "tbest_gather_ms": repeat_ms(tbest_gather, gact),
        "tbest_onehot_ms": repeat_ms(tbest_onehot, gact),
    }
    # numeric identity of the two grad forms
    ga = gact
    d = np.asarray(grad_dense(ga)) - np.asarray(grad_gathered(ga))
    out["grad_forms_max_absdiff"] = float(np.max(np.abs(d)))
    za = np.asarray(isact_scatter(ga))
    zb = np.asarray(isact_reduce(ga))
    zc = np.asarray(isact_split_mm(ga))
    out["isact_forms_identical"] = bool(
        np.array_equal(za, zb) and np.array_equal(za, zc))
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(__file__), "results",
                        "micro_scatterfree.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
