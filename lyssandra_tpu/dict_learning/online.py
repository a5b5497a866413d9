"""Online dictionary learning (Mairal, Bach, Ponce, Sapiro 2009).

Pure-functional ``(state, batch) -> state`` (SURVEY.md §7 step 6): each step
lasso-codes the minibatch (feature-sign by default, FISTA optionally),
accumulates sufficient statistics

    A <- beta A + Gamma Gamma^T        (K, K)
    B <- beta B + X Gamma^T            (p, K)

and runs ``n_sweeps`` of sequential block-coordinate descent over atoms
(``lax.scan`` — Gauss-Seidel order matches the paper and the oracle):

    d_k <- proj_{||.||<=1}( d_k + (b_k - D a_k) / A_kk + d_k ).

TPU-native hot path: ``fit`` scans ``chunk_batches`` minibatches per device
program (coding + statistics + atom sweep all inside one ``lax.scan``), so
an epoch costs a handful of dispatches instead of one launch + host sync
per minibatch — the round-1 design ran config 4 *slower than the CPU
oracle* on launch overhead alone.  Chunking (not one monolithic program)
respects the TPU worker's kernel watchdog.

Under a data mesh the minibatch lane axis is sharded; Gamma Gamma^T and
X Gamma^T contract over it and XLA's psum makes the statistics global
automatically.  Matches oracle.online_dl_step.
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lyssandra_tpu.config import OnlineDLConfig
from lyssandra_tpu.ops.dictionaries import init_dictionary
from lyssandra_tpu.solvers.lasso import (
    feature_sign as _feature_sign,
    feature_sign_scan as _feature_sign_scan,
    fista as _fista,
    _fista_body,
)

_HI = lax.Precision.HIGHEST


class OnlineDLState(NamedTuple):
    D: jax.Array   # (p, K)
    A: jax.Array   # (K, K)  sum of Gamma Gamma^T
    B: jax.Array   # (p, K)  sum of X Gamma^T
    step: jax.Array


def _dict_update_body(D, A, B, n_sweeps: int):
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


_dict_update = jax.jit(_dict_update_body, static_argnames=("n_sweeps",))


def _code_batch(D, Xb, lam, coder: str, fs_opts: dict,
                code_blocks: int = 1):
    if coder == "feature_sign":
        cb = code_blocks
        if cb > 1 and Xb.shape[1] % cb == 0:
            # code the minibatch as cb sequential sub-blocks: the
            # feature-sign while_loops exit when EVERY lane in the call
            # converges, so two half-width loops each ride their own
            # straggler instead of one full-width loop riding the worst
            # of all (same mechanism as the encoder's 2048 block
            # default, ab_fs_block.json).  Lanes are independent — the
            # codes are identical either way.
            p, bs = Xb.shape[0], Xb.shape[1] // cb
            Xs = jnp.moveaxis(Xb.reshape(p, cb, bs), 1, 0)
            Gs = lax.map(
                lambda Xi: _feature_sign_scan(D, Xi, lam, **fs_opts), Xs
            )
            return jnp.moveaxis(Gs, 0, 1).reshape(-1, cb * bs)
        return _feature_sign_scan(D, Xb, lam, **fs_opts)
    if coder == "fista":
        A0 = jnp.matmul(D.T, Xb, precision=_HI)
        g0 = jnp.zeros((D.shape[1], Xb.shape[1]), D.dtype)
        return _fista_body(D, Xb, A0, lam, g0, n_iter=300)
    raise ValueError(coder)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_sweeps", "coder", "max_active", "max_iter", "max_inner",
        "code_blocks", "warm_start", "cold_unroll",
    ),
)
def _online_chunk(
    D, A, B, Xc, lam, beta,
    *, n_sweeps, coder, max_active, max_iter, max_inner, code_blocks=1,
    warm_start=0, cold_unroll=0,
):
    """Scan the Mairal update over a chunk of minibatches in ONE device
    program.  Xc: (nb, p, bs).  Returns (D, A, B, objs, nnzs) with
    per-minibatch post-update objective and average nnz."""
    fs_opts = dict(
        max_active=max_active, max_iter=max_iter, max_inner=max_inner,
        warm_start=warm_start, cold_unroll=cold_unroll,
    )

    def step(state, Xb):
        D, A, B = state
        Gamma = _code_batch(D, Xb, lam, coder, fs_opts, code_blocks)
        A = beta * A + jnp.matmul(Gamma, Gamma.T, precision=_HI)
        B = beta * B + jnp.matmul(Xb, Gamma.T, precision=_HI)
        D = _dict_update_body(D, A, B, n_sweeps)
        R = Xb - jnp.matmul(D, Gamma, precision=_HI)
        obj = jnp.sum(R * R) + lam * jnp.sum(jnp.abs(Gamma))
        nnz = jnp.mean(jnp.sum((jnp.abs(Gamma) > 1e-10).astype(
            jnp.float32), axis=0))
        return (D, A, B), (obj, nnz)

    (D, A, B), (objs, nnzs) = lax.scan(step, (D, A, B), Xc)
    return D, A, B, objs, nnzs


@functools.partial(jax.jit, static_argnames=("n_iter",))
def holdout_objective(D, Xh, lam, n_iter: int = 300) -> jax.Array:
    """Fixed-set lasso objective (FISTA-coded) — a COMPARABLE convergence
    metric for online DL: per-minibatch objectives on different data are
    not comparable (round-1 weak point: a 'rising' objective that only
    reflected batch difficulty)."""
    A0 = jnp.matmul(D.T, Xh, precision=_HI)
    g0 = jnp.zeros((D.shape[1], Xh.shape[1]), D.dtype)
    G = _fista_body(D, Xh, A0, lam, g0, n_iter=n_iter)
    R = Xh - jnp.matmul(D, G, precision=_HI)
    return (jnp.sum(R * R) + lam * jnp.sum(jnp.abs(G))) / Xh.shape[1]


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
    minibatches from X through the chunked on-device scan.  State is a pure
    OnlineDLState (checkpointable).  With ``mesh``, minibatch lanes shard
    over the 'data' axis and D/A/B replicate (statistics psum automatically).
    """

    def __init__(
        self, cfg: OnlineDLConfig = OnlineDLConfig(), *,
        coder: str = "feature_sign", verbose: bool = False,
        mesh: jax.sharding.Mesh | None = None,
    ):
        self.cfg = cfg
        self.coder = coder
        self.verbose = verbose
        self.mesh = mesh
        self.state: OnlineDLState | None = None
        self.history_: list[dict[str, Any]] = []

    def _resolve_cold_unroll(self) -> int:
        """fs_cold_unroll=None -> 0 on EVERY backend: the r8 chip A/B
        (ab_online_unroll.json, config-4 operating point) measured the
        in-scan unroll a monotone LOSS — 3261 p/s at cu=0 vs 1976/876/
        472 at depths 8/16/28 (objectives equal) — the OPPOSITE of the
        dispatch-level coder's 3.3x win at depth 28.  Inside the epoch
        scan the coder runs per 1024-lane lax.map sub-block with no
        dispatch latency to amortize, and every unrolled step pays
        full-width (N, K) work for all lanes; the while_loop form's
        early global exit wins there.  Third in-scan knob to flip sign
        vs dispatch level (after fs_warm_start and code_blocks)."""
        cu = getattr(self.cfg, "fs_cold_unroll", None)
        if cu is not None:
            return int(cu)
        return 0

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

    def _shard_chunk(self, Xc):
        if self.mesh is None:
            return jnp.asarray(Xc)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            Xc, NamedSharding(self.mesh, P(None, None, "data"))
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

    def fit(self, X, n_epochs: int = 1, seed: int = 0,
            holdout=None, *, workspace=None, resume: bool = False,
            checkpoint_every: int = 1) -> "OnlineDictionaryLearner":
        """Stream minibatches of X (p, N) through the chunked device scan.

        holdout: optional (p, Nh) fixed signal set; its lasso objective is
        recorded after every chunk in ``history_`` (key
        ``holdout_objective``) — the comparable convergence trace.

        workspace: optional utils.Workspace; the full OnlineDLState plus
        stream position (epoch, chunk) is checkpointed every
        ``checkpoint_every`` chunks.  ``resume=True`` reloads the latest
        checkpoint and continues the IDENTICAL minibatch stream (the
        per-epoch permutations are replayed from ``seed``), so a
        preempted config-4-scale run picks up where it stopped
        (VERDICT r1 missing #4 / next #7).
        """
        X = np.asarray(X, np.float32)
        p, N = X.shape
        cfg = self.cfg
        bs = cfg.batch_size
        cb = cfg.chunk_batches
        nb_total = N // bs
        if nb_total == 0:
            raise ValueError(f"need >= batch_size={bs} signals, got {N}")
        n_chunks = (nb_total + cb - 1) // cb
        Xh = None if holdout is None else jnp.asarray(holdout, jnp.float32)
        start_epoch, start_chunk = 0, 0
        if resume and workspace is not None:
            K = cfg.K
            tmpl = {
                "D": jnp.zeros((p, K)), "A": jnp.zeros((K, K)),
                "B": jnp.zeros((p, K)),
                "step": jnp.zeros((), jnp.int32),
                "epoch": jnp.zeros((), jnp.int32),
                "chunk": jnp.zeros((), jnp.int32),
            }
            ck_step, st = workspace.load_latest_state(tmpl)
            if ck_step is not None:
                self.state = OnlineDLState(
                    st["D"], st["A"], st["B"], st["step"]
                )
                start_epoch = int(st["epoch"])
                start_chunk = int(st["chunk"]) + 1
                if start_chunk >= n_chunks:
                    start_epoch += 1
                    start_chunk = 0
        rng = np.random.default_rng(seed)
        # replay the permutation stream up to the resume point so the
        # continued run sees the identical minibatch order
        for _ in range(start_epoch):
            rng.permutation(N)
        for epoch in range(start_epoch, n_epochs):
            perm = rng.permutation(N)
            if self.state is None:
                # init from the first minibatch the stream will see, so a
                # fit() run equals the same-order partial_fit sequence
                self.state = self._init_state(jnp.asarray(X[:, perm[:bs]]))
            chunk_i = -1
            for s in range(0, nb_total, cb):
                chunk_i += 1
                if epoch == start_epoch and chunk_i < start_chunk:
                    continue
                nb = min(cb, nb_total - s)
                cols = perm[s * bs : (s + nb) * bs]
                Xc = self._shard_chunk(
                    np.ascontiguousarray(
                        X[:, cols].reshape(p, nb, bs).transpose(1, 0, 2)
                    )
                )
                t0 = time.perf_counter()
                D, A, B, objs, nnzs = _online_chunk(
                    self.state.D, self.state.A, self.state.B, Xc,
                    cfg.lam, cfg.beta,
                    n_sweeps=cfg.n_sweeps, coder=self.coder,
                    max_active=cfg.fs_max_active, max_iter=cfg.fs_max_iter,
                    max_inner=cfg.fs_max_inner,
                    code_blocks=getattr(cfg, "code_blocks", 1),
                    warm_start=getattr(cfg, "fs_warm_start", 0),
                    cold_unroll=self._resolve_cold_unroll(),
                )
                m = dict(
                    step=int(self.state.step) + nb,
                    batch_objective=float(objs[-1]),
                    avg_nnz=float(nnzs[-1]),
                )
                if Xh is not None:
                    m["holdout_objective"] = float(
                        holdout_objective(D, Xh, cfg.lam)
                    )
                m["seconds"] = time.perf_counter() - t0
                m["patches_per_sec"] = nb * bs / m["seconds"]
                self.state = OnlineDLState(D, A, B, self.state.step + nb)
                self.history_.append(m)
                if self.verbose:
                    print(f"[online-dl] {m}")
                if workspace is not None and (
                    chunk_i % checkpoint_every == 0
                    or chunk_i == n_chunks - 1
                ):
                    workspace.log_metrics(m)
                    workspace.save_state(
                        epoch * n_chunks + chunk_i,
                        {
                            "D": D, "A": A, "B": B,
                            "step": jnp.asarray(self.state.step,
                                                jnp.int32),
                            "epoch": jnp.asarray(epoch, jnp.int32),
                            "chunk": jnp.asarray(chunk_i, jnp.int32),
                        },
                    )
        return self

    @property
    def D_(self):
        return self.state.D
