"""Atom-axis (model-parallel) OMP for dictionaries too large to replicate
(SURVEY.md §2.2 / §5 'long-context analogue': shard G / alpha0 / D over a
'model' mesh axis when K grows to 10^4+).

Layout under a ('data', 'model') mesh:
    X     : (p, N)  sharded over 'data'  (patch axis), replicated on 'model'
    D     : (p, K)  sharded over 'model' (atom axis),  replicated on 'data'
    codes : GreedyResult pieces replicated on 'model' (T columns per lane)

Per pursuit step, each device scores only ITS K/m atoms against its patch
shard; two ICI collectives make the step global:

    1. selection — local max+argmin-iota, then pmax of the max and pmin of
       the (global-index) candidate over 'model': exactly the min-index
       tie-break of the replicated solver;
    2. atom fetch — the winner's owner materializes the column through a
       local one-hot matmul, psum over 'model' broadcasts it.

The per-lane Cholesky state (T x T) is tiny and computed redundantly on
every 'model' device — communication stays O(p + 1) floats per lane per
step, independent of K.  Matches omp()/batch_omp() per patch (tests pin
sharded == replicated on the CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lyssandra_tpu.solvers.greedy import (
    GreedyResult,
    _append_cholesky_inv,
    _solve_gamma,
)

_HI = lax.Precision.HIGHEST


def _omp_shard_body(Dl, X, *, T, eps, eps_mode, K, Km):
    """Per-device body (runs under shard_map): Dl (p, Km) local atoms,
    X (p, Nl) local patches."""
    p = Dl.shape[0]
    N = X.shape[1]
    Xt = X.T
    xnormsq = jnp.sum(Xt * Xt, axis=1)
    midx = lax.axis_index("model")
    offset = midx * Km

    carry = dict(
        r=Xt,
        Dsel=jnp.zeros((N, T, p), jnp.float32),
        Linv=jnp.zeros((N, T, T), jnp.float32),
        idx=jnp.zeros((N, T), jnp.int32),
        a0sel=jnp.zeros((N, T), jnp.float32),
        done=(xnormsq <= eps * eps) if eps_mode else jnp.zeros((N,), bool),
        err=xnormsq,
        nsel=jnp.zeros((N,), jnp.int32),
    )

    def step(c, t):
        stop = c["done"]

        # 1. selection: local scores, global argmax with min-index ties
        corr = jnp.matmul(c["r"], Dl, precision=_HI)       # (N, Km)
        s = jnp.abs(corr)
        mx_l = jnp.max(s, axis=1)                          # (N,)
        iota = lax.broadcasted_iota(jnp.int32, (N, Km), 1)
        k_l = jnp.min(jnp.where(s == mx_l[:, None], iota, Km), axis=1)
        mx = lax.pmax(mx_l, "model")
        cand = jnp.where(mx_l == mx, k_l + offset, K).astype(jnp.int32)
        k = lax.pmin(cand, "model")                        # global atom id

        # 2. atom fetch: owner one-hot matmul, psum-broadcast (p floats)
        local = k - offset                                 # (N,)
        own = (local >= 0) & (local < Km)
        onehot = (
            (iota == jnp.where(own, local, -1)[:, None])
        ).astype(jnp.float32)                              # (N, Km)
        dk = lax.psum(
            jnp.matmul(onehot, Dl.T, precision=_HI), "model"
        )                                                  # (N, p)

        # 3. replicated per-lane progressive Cholesky + solve (greedy.py)
        g = jnp.einsum("ntp,np->nt", c["Dsel"], dk, precision=_HI)
        Linv, nu = _append_cholesky_inv(c["Linv"], g, t)
        bad = nu <= 1e-6
        Dsel = lax.dynamic_update_slice_in_dim(
            c["Dsel"], dk[:, None, :], t, axis=1
        )
        idx = lax.dynamic_update_slice_in_dim(
            c["idx"], k[:, None], t, axis=1
        )
        a0k = jnp.sum(dk * Xt, axis=1, keepdims=True)
        a0sel = lax.dynamic_update_slice_in_dim(c["a0sel"], a0k, t, axis=1)
        gamma = _solve_gamma(Linv, a0sel)
        r = Xt - jnp.einsum("nt,ntp->np", gamma, Dsel, precision=_HI)
        err = jnp.sum(r * r, axis=1)

        frozen = stop | bad
        fz = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        done = frozen
        err_out = fz(err, c["err"])
        if eps_mode:
            done = done | (err_out <= eps * eps)
        out = dict(
            r=fz(r, c["r"]), Dsel=fz(Dsel, c["Dsel"]),
            Linv=fz(Linv, c["Linv"]), idx=fz(idx, c["idx"]),
            a0sel=fz(a0sel, c["a0sel"]), done=done, err=err_out,
            nsel=jnp.where(frozen, c["nsel"], c["nsel"] + 1),
        )
        return out, None

    c, _ = lax.scan(step, carry, jnp.arange(T))
    gamma = _solve_gamma(c["Linv"], c["a0sel"])
    valid = jnp.arange(T)[None, :] < c["nsel"][:, None]
    return (
        c["idx"], jnp.where(valid, gamma, 0.0), c["err"], c["nsel"],
    )


def omp_model_sharded(
    D, X, T: int, eps: float | None = None, *, mesh: Mesh,
    dense: bool = True,
):
    """OMP with the DICTIONARY sharded over the mesh's 'model' axis and
    patches over 'data'.  For K too large to replicate per chip; per-patch
    output matches the replicated solver exactly."""
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    p, K = D.shape
    m = mesh.shape["model"]
    d = mesh.shape["data"]
    assert K % m == 0, (K, m)
    assert X.shape[1] % d == 0, (X.shape, d)
    Km = K // m

    D = jax.device_put(D, NamedSharding(mesh, P(None, "model")))
    X = jax.device_put(X, NamedSharding(mesh, P(None, "data")))

    fn = jax.shard_map(
        functools.partial(
            _omp_shard_body,
            T=T, eps=0.0 if eps is None else float(eps),
            eps_mode=eps is not None, K=K, Km=Km,
        ),
        mesh=mesh,
        in_specs=(P(None, "model"), P(None, "data")),
        out_specs=(P("data"), P("data"), P("data"), P("data")),
        check_vma=False,
    )
    idx, gamma, err, nsel = jax.jit(fn)(D, X)
    res = GreedyResult(idx, gamma, err, nsel)
    return res.dense(K) if dense else res
