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


@functools.partial(
    jax.jit, static_argnames=("exact", "svd_iters", "atom_block")
)
def ksvd_atom_update(
    X: jax.Array, D: jax.Array, Gamma: jax.Array,
    exact: bool = False, svd_iters: int = 3, atom_block: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """One Gauss-Seidel sweep of K-SVD atom updates (residual form).

    X: (p, N), D: (p, K), Gamma: (K, N) dense codes.  Matches
    oracle.ksvd_atom_update (exact=False: single power step; exact=True:
    power-iterated rank-1 SVD).

    TPU lowering (r4 rewrite; the r1-r3 sweep was the learning-path
    bottleneck): the sweep maintains the residual R = X - D Gamma, so the
    restricted error matrix is E_k = R + d_k gamma_k on atom k's support
    and the power step needs only R:

        E_k (g o m) = R (g o m) + d_k (gamma_k . (g o m))        # (p,)
        E_k^T d     = m o (R^T d + gamma_k (d_k . d))            # (N,)

    The r1-r3 form contracted X (p, N) AND Gamma (K, N) twice per atom —
    ~230 MB of HBM traffic per atom at config-2 size, 95% of it the two
    Gamma reads; the R form reads R (p, N) instead, and a rank-1 update
    (two GEMMs per block) keeps R current after each atom block.

    ``atom_block=B``: update B consecutive atoms per step with all the
    R contractions batched into (p, N) x (N, B) GEMMs — Jacobi *within*
    the block (every atom in a block sees the same R), exact Gauss-Seidel
    *across* blocks.  B=1 is exactly the sequential oracle semantics; at
    B>1 two atoms sharing support columns see slightly stale partners
    (at config-2 density two given atoms co-occur on ~1.4% of their
    supports), trading bitwise order-dependence for a ~B-fold cut in
    sweep dispatches and R traffic — SURVEY.md §3.2's sanctioned
    iteration-level tolerance, pinned by tests
    (tests/test_dict_learning.py::test_atom_update_block_*).
    """
    p, K = D.shape
    B = max(1, min(atom_block, K))
    while K % B:                      # static: largest divisor <= request
        B -= 1
    n_power = svd_iters if exact else 1
    R = X - jnp.matmul(D, Gamma, precision=_HI)

    def update_block(carry, b):
        D, Gamma, R = carry
        k0 = b * B
        Gk = lax.dynamic_slice_in_dim(Gamma, k0, B, axis=0)   # (B, N)
        Db = lax.dynamic_slice_in_dim(D, k0, B, axis=1)       # (p, B)
        m = (jnp.abs(Gk) > 0).astype(X.dtype)
        nusers = jnp.sum(m, axis=1)                           # (B,)

        def ekg(Gt):
            """E_k @ (g_k o m_k) for every atom in the block -> (p, B)."""
            Gm = Gt * m
            return (
                jnp.matmul(R, Gm.T, precision=_HI)
                + Db * jnp.sum(Gk * Gm, axis=1)[None, :]
            )

        def ektd(Dn):
            """E_k^T d_k restricted to each support -> (B, N)."""
            return m * (
                jnp.matmul(Dn.T, R, precision=_HI)
                + Gk * jnp.sum(Db * Dn, axis=0)[:, None]
            )

        def power_step(dg, _):
            _, Gt = dg
            Dn = ekg(Gt)
            Dn = Dn / jnp.maximum(
                jnp.linalg.norm(Dn, axis=0, keepdims=True), 1e-12
            )
            return (Dn, ektd(Dn)), None

        (Dn, Gn), _ = lax.scan(
            power_step, (Db, Gk * m), None, length=n_power
        )

        ok = nusers > 0
        Dn = jnp.where(ok[None, :], Dn, Db)
        Gn = jnp.where(ok[:, None], Gn, Gk)
        # restore the invariant R = X - D Gamma for the next block
        R = (
            R
            + jnp.matmul(Db, Gk, precision=_HI)
            - jnp.matmul(Dn, Gn, precision=_HI)
        )
        D = lax.dynamic_update_slice_in_dim(D, Dn, k0, axis=1)
        Gamma = lax.dynamic_update_slice_in_dim(Gamma, Gn, k0, axis=0)
        return (D, Gamma, R), None

    (D, Gamma, _), _ = lax.scan(
        update_block, (D, Gamma, R), jnp.arange(K // B)
    )
    return D, Gamma


@functools.partial(
    jax.jit, static_argnames=("exact", "svd_iters", "atom_block")
)
def ksvd_atom_update_compact(
    X: jax.Array, D: jax.Array, idx: jax.Array, gamma: jax.Array,
    exact: bool = False, svd_iters: int = 3, atom_block: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """K-SVD atom sweep over COMPACT codes (idx/gamma (N, T)) — the dense
    (K, N) Gamma is never materialized (VERDICT r1 #5: at K=1024, N=1e6
    the dense scatter is 4 GB for <= 8 nonzeros/column; compact is 64 MB).

    Same residual-form math as :func:`ksvd_atom_update` (R = X - D Gamma
    maintained; E_k = R + d_k gamma_k on the support), with Gamma's block
    rows materialized on the fly from the compact triplets and written
    back in place.  Block-Jacobi within ``atom_block`` atoms (supports
    preserved, iteration-level tolerance per SURVEY.md §3.2).  Returns
    (D, gamma, nusers) — gamma's values updated on the original (n, t)
    slots, nusers (K,) the per-atom user counts (free by-product of the
    sweep's support masks; an `.at[idx].add` histogram of the 8M triplets
    into K bins serializes on scatter collisions on TPU).
    """
    p, K = D.shape
    N, T = idx.shape
    B = max(1, min(atom_block, K))
    while K % B:
        B -= 1
    n_power = svd_iters if exact else 1

    # canonicalize duplicate selections first: a near-breakdown OMP lane
    # (nu just above the 1e-6 freeze threshold) can select the same atom
    # twice with nonzero coefficients.  The dense scatter ADDS the two
    # slots into one entry; the per-slot write-back below would instead
    # write the full new row value into BOTH slots and double it — merge
    # duplicates into their first slot (sum), zero the rest.
    for t2 in range(1, T):
        for t1 in range(t2):
            same = (
                (idx[:, t1] == idx[:, t2])
                & (gamma[:, t1] != 0) & (gamma[:, t2] != 0)
            )
            gamma = gamma.at[:, t1].add(
                jnp.where(same, gamma[:, t2], 0.0)
            )
            gamma = gamma.at[:, t2].set(
                jnp.where(same, 0.0, gamma[:, t2])
            )

    # R = X - D Gamma from compact codes: T column gathers of D
    R = X
    for t in range(T):
        dk = jnp.take(D.T, idx[:, t], axis=0)          # (N, p)
        R = R - dk.T * gamma[:, t][None, :]

    def update_block(carry, b):
        D, gamma, R = carry
        k0 = b * B
        krange = k0 + jnp.arange(B)

        # materialize the block's code rows from the compact triplets
        Gk = jnp.zeros((B, N), X.dtype)
        for t in range(T):
            hit = idx[:, t][None, :] == krange[:, None]        # (B, N)
            Gk = Gk + jnp.where(hit, gamma[:, t][None, :], 0.0)
        Db = lax.dynamic_slice_in_dim(D, k0, B, axis=1)
        m = (jnp.abs(Gk) > 0).astype(X.dtype)
        nusers = jnp.sum(m, axis=1)

        def ekg(Gt):
            Gm = Gt * m
            return (
                jnp.matmul(R, Gm.T, precision=_HI)
                + Db * jnp.sum(Gk * Gm, axis=1)[None, :]
            )

        def ektd(Dn):
            return m * (
                jnp.matmul(Dn.T, R, precision=_HI)
                + Gk * jnp.sum(Db * Dn, axis=0)[:, None]
            )

        def power_step(dg, _):
            _, Gt = dg
            Dn = ekg(Gt)
            Dn = Dn / jnp.maximum(
                jnp.linalg.norm(Dn, axis=0, keepdims=True), 1e-12
            )
            return (Dn, ektd(Dn)), None

        (Dn, Gn), _ = lax.scan(
            power_step, (Db, Gk * m), None, length=n_power
        )
        ok = nusers > 0
        Dn = jnp.where(ok[None, :], Dn, Db)
        Gn = jnp.where(ok[:, None], Gn, Gk)
        R = (
            R
            + jnp.matmul(Db, Gk, precision=_HI)
            - jnp.matmul(Dn, Gn, precision=_HI)
        )
        D = lax.dynamic_update_slice_in_dim(D, Dn, k0, axis=1)
        # write the new row values back into the compact slots; the
        # gamma != 0 guard matches the dense support mask m (padded idx-0
        # slots carry gamma == 0 and must not receive atom 0's values).
        # The row lookup is a one-hot reduction, NOT take_along_axis: a
        # per-lane gather from (B, N) is latency-bound on TPU (measured
        # ~0.5 ms / 32k lanes, CLAUDE.md) and at N=1e6 x T x K/B blocks
        # it dominated the whole sweep.
        for t in range(T):
            rel = idx[:, t] - k0
            inb = (rel >= 0) & (rel < B) & (gamma[:, t] != 0)
            val = jnp.sum(
                jnp.where(rel[None, :] == jnp.arange(B)[:, None], Gn, 0.0),
                axis=0,
            )
            gamma = gamma.at[:, t].set(
                jnp.where(inb, val, gamma[:, t])
            )
        return (D, gamma, R), nusers

    (D, gamma, _), nusers = lax.scan(
        update_block, (D, gamma, R), jnp.arange(K // B)
    )
    return D, gamma, nusers.reshape(K)


def _stats_to_metrics(vals) -> dict[str, Any]:
    out = dict(
        objective=float(vals[0]), rmse=float(vals[1]),
        avg_nnz=float(vals[2]), atoms_replaced=int(vals[3]),
    )
    if len(vals) > 4:
        # post-coding objective (before the atom sweep).  The sweep phase
        # is the monotone one: objective <= objective_coding holds exactly
        # (tests pin it at 0.1% fp32 slack).  The CODING step carries no
        # such guarantee — greedy OMP re-codes from scratch and its
        # T-sparse solution can lose to the previous iteration's
        # sweep-refined codes, so the cross-iteration trace may tick up
        # near convergence (+0.08% at config-2 iter 19->20; the fp64
        # NumPy oracle shows the same, +1.8% on synthetic patches —
        # NOTES_r8.md).  This is a property of K-SVD-with-OMP, not a bug.
        out["objective_coding"] = float(vals[4])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("exact", "svd_iters", "atom_block", "replace_dead",
                     "min_use", "max_coherence"),
)
def _ksvd_compact_post(
    X, D, idx, gamma, code_err, *, exact, svd_iters, atom_block,
    replace_dead, min_use, max_coherence,
):
    """Jitted post-coding tail of a compact K-SVD iteration: atom sweep,
    stats, dead-atom replacement, normalization — all on compact codes."""
    from lyssandra_tpu.ops.dictionaries import normalize_atoms as _norm

    K = D.shape[1]
    T = idx.shape[1]
    D, gamma, nusers = ksvd_atom_update_compact(
        X, D, idx, gamma, exact=exact, svd_iters=svd_iters,
        atom_block=atom_block,
    )
    R = X
    for t in range(T):
        dk = jnp.take(D.T, idx[:, t], axis=0)
        R = R - dk.T * gamma[:, t][None, :]
    err = jnp.sum(R * R, axis=0)
    obj = err.sum()
    stats = [obj, jnp.sqrt((R * R).mean()),
             (gamma != 0).sum(axis=1).mean().astype(jnp.float32)]
    if replace_dead:
        use = nusers
        # at most K replacements happen, so the K worst signals suffice:
        # top_k beats a full argsort of N=1e6 on TPU (sorts are slow on
        # the VPU; semantics identical — rank below never exceeds K-1)
        _, order = lax.top_k(err, min(K, err.shape[0]))
        # upper-triangle coherence flag = the oracle's sequential keep-one
        # semantics (see ops.dictionaries.replace_unused_atoms)
        G = jnp.abs(jnp.matmul(D.T, D, precision=_HI)) * jnp.triu(
            jnp.ones((K, K), D.dtype), k=1
        )
        bad = (use < min_use) | (G.max(axis=1) > max_coherence)
        rank = jnp.cumsum(bad) - 1
        src = order[rank % order.shape[0]]
        repl = X[:, src]
        repl = repl / jnp.maximum(
            jnp.linalg.norm(repl, axis=0, keepdims=True), 1e-10
        )
        D = jnp.where(bad[None, :], repl, D)
        gamma = jnp.where(bad[idx], 0.0, gamma)
        stats.append(bad.sum().astype(jnp.float32))
    else:
        stats.append(jnp.zeros((), jnp.float32))
    stats.append(code_err.sum())        # post-coding objective (free:
    return _norm(D), gamma, err, jnp.stack(stats)  # GreedyResult.err)


def ksvd_step_compact(
    X: jax.Array, D: jax.Array, encoder: SparseEncoder, cfg: KSVDConfig,
):
    """One K-SVD iteration on compact codes: no (K, N) Gamma anywhere.

    Returns (D, GreedyResult codes, device stats).  The coding step asks
    the encoder for dense=False (greedy routes return idx/gamma (N, T));
    the sweep/replacement tail runs in one jitted program.
    """
    res = encoder.encode(X, D, dense=False)
    D, gamma, err, stats = _ksvd_compact_post(
        X, D, res.idx, res.gamma, res.err,
        exact=cfg.exact_svd, svd_iters=cfg.svd_iters,
        atom_block=max(cfg.atom_block, 8),
        replace_dead=cfg.replace_dead, min_use=cfg.min_use,
        max_coherence=cfg.max_coherence,
    )
    from lyssandra_tpu.solvers.greedy import GreedyResult

    return D, GreedyResult(res.idx, gamma, err, res.nsel), stats


def ksvd_step(
    X: jax.Array, D: jax.Array, encoder: SparseEncoder,
    cfg: KSVDConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One full K-SVD iteration: code, update atoms, replace dead atoms.

    Returns (D, Gamma, stats) with stats a DEVICE-resident (4,) array
    [objective, rmse, avg_nnz, atoms_replaced] — callers batch the host
    fetch (each fetch costs ~31 ms over the tunnel, CLAUDE.md; per-
    iteration float() calls were a third of the r1 warm iteration time,
    and the r4 learner defers the fetch to the end of fit entirely).
    """
    Gamma = encoder.encode(X, D)
    Rc = X - D @ Gamma
    obj_code = (Rc * Rc).sum()          # post-coding objective (pre-sweep)
    D, Gamma = ksvd_atom_update(
        X, D, Gamma, exact=cfg.exact_svd, svd_iters=cfg.svd_iters,
        atom_block=cfg.atom_block,
    )
    # metrics reflect the post-update model, BEFORE atom replacement —
    # replaced atoms get fresh (empty) code rows only at the next coding
    # step, so including them here would spike the objective artificially.
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
    stats.append(obj_code)
    D = normalize_atoms(D)
    return D, Gamma, jnp.stack(stats)


class KSVDLearner:
    """Reference-mirroring `ksvd` class: ``fit(X) -> self`` with learned
    ``D_`` (p, K) and final codes ``Gamma_`` (SURVEY.md §2.1 'K-SVD').

    Structured per-iteration metrics (objective, rmse, nnz, atoms replaced,
    patches/sec) are collected in ``history_`` — the rebuild's observability
    surface (SURVEY.md §5).

    Code representation: with ``cfg.codes`` 'compact' (or 'auto' at huge
    K*N), the whole fit runs on compact idx/gamma (N, T) codes — no dense
    (K, N) Gamma is ever built — and ``Gamma_`` is a
    :class:`~lyssandra_tpu.solvers.greedy.GreedyResult` (use
    ``.dense(K)`` or ``.to_csc(K)`` to export).
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
        # a per-iteration host consumer (verbose print, callback, metrics
        # JSONL) forces a per-iteration fetch; otherwise stats stay on
        # device and ONE stacked fetch at the end covers the whole fit —
        # per-iteration round trips cost ~31 ms each over the tunnel and
        # dominated small warm iterations in r1-r3
        eager_metrics = (
            self.verbose or self.callback is not None
            or self.workspace is not None
        )
        compact = cfg.codes == "compact" or (
            cfg.codes == "auto"
            and 4 * cfg.K * X.shape[1] > (1 << 30)
            and self.encoder.algorithm in SparseEncoder._COMPACT
        )
        step_fn = ksvd_step_compact if compact else ksvd_step
        pending: list[tuple[int, jax.Array, float]] = []
        t_fit0 = time.perf_counter()
        for it in range(start, total):
            t0 = time.perf_counter()
            D, Gamma, stats = step_fn(X, D, self.encoder, cfg)
            if eager_metrics:
                import numpy as np

                metrics = _stats_to_metrics(np.asarray(stats))
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
                    if (it + 1) % self.checkpoint_every == 0 \
                            or it == total - 1:
                        self.workspace.save_state(
                            it, {"D": D, "iter": jnp.asarray(it, jnp.int32)}
                        )
            else:
                pending.append((it, stats, time.perf_counter() - t0))
        if Gamma is None:                     # fully resumed: re-code once
            Gamma = self.encoder.encode(X, D, dense=not compact)
        if pending:
            import numpy as np

            all_vals = np.asarray(jnp.stack([s for _, s, _ in pending]))
            t_wall = time.perf_counter() - t_fit0
            for (it, _, dt), vals in zip(pending, all_vals):
                metrics = _stats_to_metrics(vals)
                # dispatch is async without a per-iter sync: record the
                # amortized wall rate, not the meaningless dispatch time
                metrics["seconds"] = t_wall / len(pending)
                metrics["dispatch_seconds"] = dt
                metrics["patches_per_sec"] = (
                    X.shape[1] * len(pending) / t_wall
                )
                metrics["iter"] = it
                self.history_.append(metrics)
        self.D_ = D
        self.Gamma_ = Gamma
        return self

    def encode(self, X, *, dense: bool = True):
        """Codes of X over the learned dictionary (dense Gamma (K, N), or
        a compact GreedyResult with dense=False on greedy routes)."""
        return self.encoder.encode(
            jnp.asarray(X, jnp.float32), self.D_, dense=dense
        )


ksvd = KSVDLearner  # reference-style lowercase alias
