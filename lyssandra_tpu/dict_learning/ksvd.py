"""K-SVD dictionary learning (Aharon/Elad/Bruckstein 2006; approximate
variant per Rubinstein et al. 2008).

TPU-native design (SURVEY.md §7 step 6): the coding step is the batched
Batch-OMP scan (sharded over the patch axis of the data mesh); the atom
update is a ``lax.scan`` over the K atoms — *sequential on purpose*, because
K-SVD's Gauss-Seidel semantics (atom k+1 sees atom k's update) are part of
the algorithm's convergence behavior (SURVEY.md §3.2 parity note).  Each
scan step never materializes the restricted error matrix E_k: it uses the
two-GEMV form

    E_k g = X (g o m) - D (Gamma (g o m)) + d_k (gamma_k . (g o m))

per the efficient K-SVD formulation, so a full sweep is ~4 N (p + K) flops
per atom, all batched matvecs.

``exact_svd=True`` runs ``svd_iters`` power iterations of the rank-1 SVD
(converging to the oracle's exact SVD); ``False`` is the approximate K-SVD
single power step — the oracle implements both (oracle.ksvd_atom_update).

Sharded sufficient statistics: when X/Gamma are sharded over a data mesh,
the matvecs X@g, Gamma@g, X^T d, Gamma^T(D^T d) contract over the sharded N
axis — XLA inserts the psum automatically under jit; no hand-written
collectives are needed (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.config import KSVDConfig
from lyssandra_tpu.ops.dictionaries import (
    init_dictionary,
    normalize_atoms,
    replace_unused_atoms,
)
from lyssandra_tpu.solvers.encoder import SparseEncoder

_HI = lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("exact", "svd_iters"))
def ksvd_atom_update(
    X: jax.Array, D: jax.Array, Gamma: jax.Array,
    exact: bool = False, svd_iters: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """One sequential (Gauss-Seidel) sweep of K-SVD atom updates.

    X: (p, N), D: (p, K), Gamma: (K, N) dense codes.  Matches
    oracle.ksvd_atom_update (exact=False: single power step; exact=True:
    power-iterated rank-1 SVD).
    """
    p, K = D.shape
    n_power = svd_iters if exact else 1

    def update_atom(carry, k):
        D, Gamma = carry
        gk = lax.dynamic_slice_in_dim(Gamma, k, 1, axis=0)[0]     # (N,)
        m = (jnp.abs(gk) > 0).astype(X.dtype)
        dk = lax.dynamic_slice_in_dim(D, k, 1, axis=1)[:, 0]      # (p,)
        nusers = jnp.sum(m)

        def ekg(g):
            """E_k @ (g o m) via two GEMVs (no E_k materialization)."""
            gm = g * m
            return (
                jnp.matmul(X, gm, precision=_HI)
                - jnp.matmul(D, jnp.matmul(Gamma, gm, precision=_HI),
                             precision=_HI)
                + dk * jnp.dot(gk, gm)
            )

        def ektd(d):
            """E_k^T d restricted to the support."""
            return m * (
                jnp.matmul(X.T, d, precision=_HI)
                - jnp.matmul(Gamma.T, jnp.matmul(D.T, d, precision=_HI),
                             precision=_HI)
                + gk * jnp.dot(dk, d)
            )

        def power_step(dg, _):
            _, g = dg
            d = ekg(g)
            d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
            return (d, ektd(d)), None

        (d_new, g_new), _ = lax.scan(
            power_step, (dk, gk * m), None, length=n_power
        )

        ok = nusers > 0
        d_new = jnp.where(ok, d_new, dk)
        g_new = jnp.where(ok, g_new, gk)
        D = lax.dynamic_update_slice_in_dim(D, d_new[:, None], k, axis=1)
        Gamma = lax.dynamic_update_slice_in_dim(
            Gamma, g_new[None, :], k, axis=0
        )
        return (D, Gamma), None

    (D, Gamma), _ = lax.scan(update_atom, (D, Gamma), jnp.arange(K))
    return D, Gamma


def ksvd_step(
    X: jax.Array, D: jax.Array, encoder: SparseEncoder,
    cfg: KSVDConfig,
) -> tuple[jax.Array, jax.Array, dict[str, Any]]:
    """One full K-SVD iteration: code, update atoms, replace dead atoms."""
    Gamma = encoder.encode(X, D)
    D, Gamma = ksvd_atom_update(
        X, D, Gamma, exact=cfg.exact_svd, svd_iters=cfg.svd_iters
    )
    # metrics reflect the post-update model, BEFORE atom replacement —
    # replaced atoms get fresh (empty) code rows only at the next coding
    # step, so including them here would spike the objective artificially.
    # All metrics are stacked on device and fetched in ONE host round
    # trip: each fetch costs ~31 ms over the tunnel (CLAUDE.md), and four
    # separate float() calls were a third of the warm iteration time.
    R = X - D @ Gamma
    obj = (R * R).sum()
    stats = [obj, jnp.sqrt((R * R).mean()),
             (jnp.abs(Gamma) > 0).sum(axis=0).mean().astype(jnp.float32)]
    if cfg.replace_dead:
        D, bad = replace_unused_atoms(
            X, D, Gamma, min_use=cfg.min_use,
            max_coherence=cfg.max_coherence, return_mask=True,
        )
        # zero the stale code rows of replaced atoms so D @ Gamma stays
        # meaningful between iterations
        Gamma = jnp.where(bad[:, None], 0.0, Gamma)
        stats.append(bad.sum().astype(jnp.float32))
    else:
        stats.append(jnp.zeros((), jnp.float32))
    D = normalize_atoms(D)
    import numpy as np

    vals = np.asarray(jnp.stack(stats))
    metrics = dict(
        objective=float(vals[0]), rmse=float(vals[1]),
        avg_nnz=float(vals[2]), atoms_replaced=int(vals[3]),
    )
    return D, Gamma, metrics


class KSVDLearner:
    """Reference-mirroring `ksvd` class: ``fit(X) -> self`` with learned
    ``D_`` (p, K) and final codes ``Gamma_`` (SURVEY.md §2.1 'K-SVD').

    Structured per-iteration metrics (objective, rmse, nnz, atoms replaced,
    patches/sec) are collected in ``history_`` — the rebuild's observability
    surface (SURVEY.md §5).
    """

    def __init__(
        self, cfg: KSVDConfig = KSVDConfig(), *,
        encoder: SparseEncoder | None = None, verbose: bool = False,
        callback: Callable[[int, dict], None] | None = None,
        workspace=None, checkpoint_every: int = 5,
        mesh: jax.sharding.Mesh | None = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.encoder = encoder or SparseEncoder(
            "bomp", {"T": cfg.T}, check_atoms=False, mesh=mesh
        )
        self.verbose = verbose
        self.callback = callback
        self.workspace = workspace           # utils.Workspace for resume
        self.checkpoint_every = checkpoint_every
        self.history_: list[dict[str, Any]] = []

    def fit(self, X, D0=None, n_iter: int | None = None,
            resume: bool = False) -> "KSVDLearner":
        X = jnp.asarray(X, jnp.float32)
        cfg = self.cfg
        if self.mesh is not None:
            # patch axis sharded over 'data'; D replicates below.  The
            # atom-update matvecs contract over the sharded axis, so XLA
            # inserts the psums — the public class trains multi-chip
            # (SURVEY.md §2.2; the round-1 gap was that only the private
            # parallel.sharded_ksvd_step did)
            from jax.sharding import NamedSharding, PartitionSpec as P

            X = jax.device_put(X, NamedSharding(self.mesh, P(None, "data")))
        D = (
            jnp.asarray(D0, jnp.float32)
            if D0 is not None
            else init_dictionary(X, cfg.K, cfg.init, cfg.seed)
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            D = jax.device_put(D, NamedSharding(self.mesh, P()))
        start = 0
        if resume and self.workspace is not None:
            step, state = self.workspace.load_latest_state(
                {"D": D, "iter": jnp.zeros((), jnp.int32)}
            )
            if step is not None:
                D = state["D"]
                start = int(state["iter"]) + 1
        total = n_iter if n_iter is not None else cfg.n_iter
        Gamma = None
        for it in range(start, total):
            t0 = time.perf_counter()
            D, Gamma, metrics = ksvd_step(X, D, self.encoder, cfg)
            jax.block_until_ready(D)
            metrics["seconds"] = time.perf_counter() - t0
            metrics["patches_per_sec"] = X.shape[1] / metrics["seconds"]
            metrics["iter"] = it
            self.history_.append(metrics)
            if self.verbose:
                print(f"[ksvd it {it}] {metrics}")
            if self.callback is not None:
                self.callback(it, metrics)
            if self.workspace is not None:
                self.workspace.log_metrics(metrics)
                if (it + 1) % self.checkpoint_every == 0 or it == total - 1:
                    self.workspace.save_state(
                        it, {"D": D, "iter": jnp.asarray(it, jnp.int32)}
                    )
        if Gamma is None:                     # fully resumed: re-code once
            Gamma = self.encoder.encode(X, D)
        self.D_ = D
        self.Gamma_ = Gamma
        return self

    def encode(self, X) -> jax.Array:
        return self.encoder.encode(jnp.asarray(X, jnp.float32), self.D_)


ksvd = KSVDLearner  # reference-style lowercase alias
