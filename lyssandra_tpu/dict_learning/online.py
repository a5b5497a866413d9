"""Online dictionary learning (Mairal, Bach, Ponce, Sapiro 2009).

Pure-functional ``(state, batch) -> state`` (SURVEY.md §7 step 6): each step
lasso-codes the minibatch (feature-sign by default, FISTA optionally),
accumulates sufficient statistics

    A <- beta A + Gamma Gamma^T        (K, K)
    B <- beta B + X Gamma^T            (p, K)

and runs ``n_sweeps`` of sequential block-coordinate descent over atoms
(``lax.scan`` — Gauss-Seidel order matches the paper and the oracle):

    d_k <- proj_{||.||<=1}( d_k + (b_k - D a_k) / A_kk ).

Under a data mesh, Gamma Gamma^T and X Gamma^T contract over the sharded
patch axis — XLA's psum makes the statistics global automatically.
Matches oracle.online_dl_step.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.config import OnlineDLConfig
from lyssandra_tpu.ops.dictionaries import init_dictionary
from lyssandra_tpu.solvers.lasso import feature_sign as _feature_sign, \
    fista as _fista

_HI = lax.Precision.HIGHEST


class OnlineDLState(NamedTuple):
    D: jax.Array   # (p, K)
    A: jax.Array   # (K, K)  sum of Gamma Gamma^T
    B: jax.Array   # (p, K)  sum of X Gamma^T
    step: jax.Array


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
def _dict_update(D, A, B, n_sweeps: int):
    K = D.shape[1]

    def update_atom(D, k):
        ak = lax.dynamic_slice_in_dim(A, k, 1, axis=1)[:, 0]   # (K,)
        bk = lax.dynamic_slice_in_dim(B, k, 1, axis=1)[:, 0]   # (p,)
        dk = lax.dynamic_slice_in_dim(D, k, 1, axis=1)[:, 0]
        akk = jnp.take(ak, k)
        u = dk + (bk - jnp.matmul(D, ak, precision=_HI)) / jnp.maximum(
            akk, 1e-10
        )
        u = u / jnp.maximum(1.0, jnp.linalg.norm(u))
        u = jnp.where(akk < 1e-10, dk, u)
        return lax.dynamic_update_slice_in_dim(D, u[:, None], k, axis=1), None

    for _ in range(n_sweeps):
        D, _ = lax.scan(update_atom, D, jnp.arange(K))
    return D


def online_dl_step(
    state: OnlineDLState, Xb: jax.Array, cfg: OnlineDLConfig,
    *, coder: str = "feature_sign",
) -> tuple[OnlineDLState, jax.Array]:
    """One minibatch step; returns (new state, minibatch codes)."""
    if coder == "feature_sign":
        Gamma = _feature_sign(state.D, Xb, cfg.lam)
    elif coder == "fista":
        Gamma = _fista(state.D, Xb, cfg.lam)
    else:
        raise ValueError(coder)
    A = cfg.beta * state.A + jnp.matmul(Gamma, Gamma.T, precision=_HI)
    B = cfg.beta * state.B + jnp.matmul(Xb, Gamma.T, precision=_HI)
    D = _dict_update(state.D, A, B, cfg.n_sweeps)
    return OnlineDLState(D, A, B, state.step + 1), Gamma


class OnlineDictionaryLearner:
    """Reference-mirroring online learner with ``partial_fit`` (SURVEY §2.1).

    ``partial_fit(Xb)`` consumes one minibatch; ``fit(X, n_epochs)`` streams
    minibatches from X.  State is a pure OnlineDLState (checkpointable).
    """

    def __init__(
        self, cfg: OnlineDLConfig = OnlineDLConfig(), *,
        coder: str = "feature_sign", verbose: bool = False,
    ):
        self.cfg = cfg
        self.coder = coder
        self.verbose = verbose
        self.state: OnlineDLState | None = None
        self.history_: list[dict[str, Any]] = []

    def _init_state(self, Xb):
        p = Xb.shape[0]
        K = self.cfg.K
        D = init_dictionary(Xb, K, "data", self.cfg.seed)
        return OnlineDLState(
            D,
            jnp.zeros((K, K), jnp.float32),
            jnp.zeros((p, K), jnp.float32),
            jnp.zeros((), jnp.int32),
        )

    def partial_fit(self, Xb) -> "OnlineDictionaryLearner":
        Xb = jnp.asarray(Xb, jnp.float32)
        if self.state is None:
            self.state = self._init_state(Xb)
        self.state, Gamma = online_dl_step(
            self.state, Xb, self.cfg, coder=self.coder
        )
        R = Xb - self.state.D @ Gamma
        m = dict(
            step=int(self.state.step),
            batch_objective=float((R * R).sum() + self.cfg.lam
                                  * jnp.abs(Gamma).sum()),
            avg_nnz=float((jnp.abs(Gamma) > 1e-10).sum(axis=0).mean()),
        )
        self.history_.append(m)
        if self.verbose:
            print(f"[online-dl] {m}")
        return self

    def fit(self, X, n_epochs: int = 1, seed: int = 0):
        import numpy as np

        X = jnp.asarray(X, jnp.float32)
        N = X.shape[1]
        bs = self.cfg.batch_size
        rng = np.random.default_rng(seed)
        for _ in range(n_epochs):
            perm = rng.permutation(N)
            for s in range(0, N - bs + 1, bs):
                self.partial_fit(X[:, perm[s : s + bs]])
        return self

    @property
    def D_(self):
        return self.state.D
