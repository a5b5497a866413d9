"""Batched convex sparse solvers: feature-sign search (lasso) and FISTA.

Feature-sign search (Lee, Battle, Raina, Ng, NIPS 2006) solves

    min_g ||x - D g||^2 + lam * ||g||_1

for thousands of signals at once as a ``lax.while_loop`` (SURVEY.md §7
step 5).  TPU-native shape discipline: the active set lives in a fixed
capacity of ``max_active`` slots per lane (static shapes); activation /
deactivation toggles slot masks; the analytic minimizer over the active set
is one batched (N, A, A) solve; the discrete line search over sign flips
evaluates all A+1 candidate crossings for every lane in one shot via the
active Gram.  Lanes freeze via a ``done`` mask when their KKT conditions
hold; the loop exits when all lanes are done.

FISTA is provided as a cheap alternative coder for the same objective
(useful inside online dictionary learning); it shares the objective
convention ``||.||^2`` (no 1/2) with the oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


class FeatureSignResult(NamedTuple):
    Gamma: jax.Array      # (K, N) dense codes
    n_iter: jax.Array     # () outer iterations executed
    done: jax.Array       # (N,) per-lane convergence flag
    overflow: jax.Array   # (N,) lane wanted > max_active active atoms


def _gather_gram(G, idx):
    """G[idx_i, idx_j] per lane: (N, A, A) from (K, K) and (N, A)."""
    rows = jnp.take(G, idx, axis=0)                 # (N, A, K)
    return jnp.take_along_axis(
        rows, idx[:, None, :].repeat(rows.shape[1], 1), axis=2
    )


@functools.partial(
    jax.jit, static_argnames=("max_active", "max_iter", "max_inner")
)
def _feature_sign_impl(
    G, A0, xnormsq, lam, *, max_active, max_iter, max_inner
):
    """G = D^T D (K, K); A0 = D^T X as (N, K); xnormsq (N,)."""
    N, K = A0.shape
    A = max_active
    eyeA = jnp.eye(A, dtype=A0.dtype)

    def grad_full(gfull):
        # d/dg ||x - Dg||^2 = 2 (G g - D^T x)
        return 2.0 * (jnp.matmul(gfull, G, precision=_HI) - A0)

    def dense(idx, mask, gact):
        z = jnp.zeros((N, K), A0.dtype)
        return z.at[jnp.arange(N)[:, None], idx].add(
            jnp.where(mask, gact, 0.0)
        )

    def inner_step(st):
        """One feature-sign refinement over the active set."""
        idx, mask, theta, gact, iref = st
        maskf = mask.astype(A0.dtype)
        M = _gather_gram(G, idx)                            # (N, A, A)
        M = M * maskf[:, :, None] * maskf[:, None, :]
        M = M + eyeA[None] * (1.0 - maskf)[:, :, None] * eyeA[None]
        # pad invalid rows/cols to identity so the solve is well-posed
        Mp = jnp.where(
            (maskf[:, :, None] * maskf[:, None, :]) > 0, M, eyeA[None]
        )
        Mp = Mp + 1e-6 * eyeA[None]   # fp32 conditioning (unit-norm Gram)
        a0sel = jnp.take_along_axis(A0, idx, axis=1) * maskf
        rhs = (a0sel - lam * theta / 2.0) * maskf
        gnew = jnp.linalg.solve(Mp, rhs[..., None])[..., 0] * maskf

        # discrete line search over zero crossings of g + t (gnew - g)
        diff = gnew - gact
        tcross = jnp.where(
            jnp.abs(diff) > 1e-15, -gact / jnp.where(
                jnp.abs(diff) > 1e-15, diff, 1.0
            ), -1.0
        )
        valid_t = (tcross > 0.0) & (tcross < 1.0) & mask
        ts = jnp.concatenate(
            [jnp.ones((N, 1), A0.dtype), jnp.where(valid_t, tcross, 1.0)],
            axis=1,
        )                                                    # (N, A+1)
        gt = gact[:, None, :] + ts[..., None] * diff[:, None, :]  # (N,C,A)
        # obj(t) = ||x||^2 - 2 g.a0 + g^T M g + lam |g|_1  (constant dropped)
        lin = -2.0 * jnp.einsum("nca,na->nc", gt, a0sel)
        quad = jnp.einsum(
            "nca,nab,ncb->nc", gt, Mp, gt, precision=_HI
        )
        l1 = lam * jnp.sum(jnp.abs(gt) * maskf[:, None, :], axis=2)
        obj = lin + quad + l1
        best = jnp.argmin(obj, axis=1)
        gbest = jnp.take_along_axis(gt, best[:, None, None], axis=1)[:, 0]

        # deactivate zeroed coefficients
        nz = jnp.abs(gbest) >= 1e-12
        mask2 = mask & nz
        gact2 = jnp.where(mask2, gbest, 0.0)
        theta2 = jnp.where(mask2, jnp.sign(gbest), 0.0)
        return (idx, mask2, theta2, gact2, iref + 1)

    def inner_cond(st):
        idx, mask, theta, gact, iref = st
        if_any = iref < max_inner
        # active-set optimality: grad_A + lam * theta == 0
        maskf = mask.astype(A0.dtype)
        M = _gather_gram(G, idx) * maskf[:, :, None] * maskf[:, None, :]
        a0sel = jnp.take_along_axis(A0, idx, axis=1) * maskf
        gr = 2.0 * (jnp.einsum("nab,nb->na", M, gact) - a0sel)
        viol = jnp.abs(gr + lam * theta) * maskf
        lane_not_opt = jnp.any(viol > 1e-7, axis=1) & jnp.any(mask, axis=1)
        return if_any & jnp.any(lane_not_opt)

    def outer_step(st):
        idx, mask, theta, gact, done, overflow, it = st
        gfull = dense(idx, mask, gact)
        gr = grad_full(gfull)

        is_active = jnp.zeros((N, K), bool).at[
            jnp.arange(N)[:, None], idx
        ].max(mask)
        cand_score = jnp.where(is_active, -jnp.inf, jnp.abs(gr))
        istar = jnp.argmax(cand_score, axis=1).astype(jnp.int32)
        has_cand = jnp.take_along_axis(
            cand_score, istar[:, None], 1
        )[:, 0] > lam + 1e-12

        # first free slot (mask False); overflow if none
        free = jnp.argmin(mask.astype(jnp.int32), axis=1).astype(jnp.int32)
        no_free = jnp.all(mask, axis=1)
        activate = has_cand & ~done & ~no_free
        ovf = overflow | (has_cand & no_free & ~done)

        slot_hot = jax.nn.one_hot(free, A, dtype=bool) & activate[:, None]
        idx2 = jnp.where(slot_hot, istar[:, None], idx)
        mask2 = mask | slot_hot
        gr_at = jnp.take_along_axis(gr, istar[:, None], 1)[:, 0]
        theta2 = jnp.where(slot_hot, -jnp.sign(gr_at)[:, None], theta)
        gact2 = jnp.where(slot_hot, 0.0, gact)

        idx3, mask3, theta3, gact3, _ = lax.while_loop(
            inner_cond, inner_step,
            (idx2, mask2, theta2, gact2, jnp.zeros((), jnp.int32)),
        )

        # zero-coefficient optimality check
        gfull3 = dense(idx3, mask3, gact3)
        gr3 = grad_full(gfull3)
        is_act3 = jnp.zeros((N, K), bool).at[
            jnp.arange(N)[:, None], idx3
        ].max(mask3)
        opt = jnp.all(
            jnp.where(is_act3, 0.0, jnp.abs(gr3)) <= lam + 1e-6, axis=1
        )
        done2 = done | opt | ovf

        # frozen lanes keep previous state
        fz1 = lambda new, old: jnp.where(done[:, None], old, new)
        return (
            fz1(idx3, idx), fz1(mask3, mask), fz1(theta3, theta),
            fz1(gact3, gact), done2, ovf, it + 1,
        )

    def outer_cond(st):
        *_, done, _, it = st
        return (it < max_iter) & ~jnp.all(done)

    idx = jnp.zeros((N, A), jnp.int32)
    mask = jnp.zeros((N, A), bool)
    theta = jnp.zeros((N, A), A0.dtype)
    gact = jnp.zeros((N, A), A0.dtype)
    # lanes where g = 0 already satisfies the KKT conditions:
    # |grad| = |2 D^T x| <= lam everywhere
    done0 = jnp.all(2.0 * jnp.abs(A0) <= lam + 1e-12, axis=1)
    st = lax.while_loop(
        outer_cond, outer_step,
        (idx, mask, theta, gact, done0,
         jnp.zeros((N,), bool), jnp.zeros((), jnp.int32)),
    )
    idx, mask, theta, gact, done, overflow, it = st
    gfull = dense(idx, mask, gact)
    return FeatureSignResult(gfull.T, it, done, overflow)


def feature_sign(
    D: jax.Array, X: jax.Array, lam: float,
    *, max_active: int = 64, max_iter: int = 100, max_inner: int = 20,
    full_result: bool = False, polish: bool = True,
):
    """Batched feature-sign search (oracle.feature_sign / oracle.lasso).

    Solves min_g ||x - D g||^2 + lam ||g||_1 per column of X.  Returns the
    dense code matrix Gamma (K, N), or a FeatureSignResult with
    convergence/overflow diagnostics when full_result=True.

    Robustness: feature-sign's active-set swaps can limit-cycle in fp32
    when the solution is dense (small lam, nnz -> p) — outside the
    algorithm's sparse design domain.  With ``polish`` (default), lanes
    that did not reach their KKT conditions are re-solved with FISTA and
    the better objective wins, so every lane converges for every lam.
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    G = jnp.matmul(D.T, D, precision=_HI)
    A0 = jnp.matmul(X.T, D, precision=_HI)
    xnormsq = jnp.sum(X * X, axis=0)
    res = _feature_sign_impl(
        G, A0, xnormsq, float(lam),
        max_active=max_active, max_iter=max_iter, max_inner=max_inner,
    )
    if polish and bool(jnp.any(~res.done | res.overflow)):
        Gf = fista(D, X, lam, n_iter=500)

        def obj(Gm):
            R = X - jnp.matmul(D, Gm, precision=_HI)
            return jnp.sum(R * R, axis=0) + lam * jnp.sum(jnp.abs(Gm),
                                                          axis=0)

        better = obj(Gf) < obj(res.Gamma)
        take_f = (~res.done | res.overflow) & better
        Gamma = jnp.where(take_f[None, :], Gf, res.Gamma)
        res = FeatureSignResult(
            Gamma, res.n_iter, res.done | take_f, res.overflow & ~take_f
        )
    return res if full_result else res.Gamma


lasso = feature_sign


@functools.partial(jax.jit, static_argnames=("n_iter",))
def fista(
    D: jax.Array, X: jax.Array, lam: float, n_iter: int = 200
) -> jax.Array:
    """FISTA for the same objective ||x - Dg||^2 + lam ||g||_1.

    A cheap, fully-batched alternative coder (Beck & Teboulle 2009); useful
    as the coding step of online dictionary learning when feature-sign's
    exact active-set solve isn't needed.  Returns Gamma (K, N).
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    G = jnp.matmul(D.T, D, precision=_HI)
    A0 = jnp.matmul(D.T, X, precision=_HI)
    # Lipschitz constant of grad ||x-Dg||^2 = 2 G: L = 2 lmax(G)
    L = 2.0 * jnp.linalg.eigvalsh(G)[-1] + 1e-6
    K, N = D.shape[1], X.shape[1]

    def shrink(v, t):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)

    def step(carry, _):
        g, y, t = carry
        grad = 2.0 * (jnp.matmul(G, y, precision=_HI) - A0)
        gnew = shrink(y - grad / L, lam / L)
        tnew = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        ynew = gnew + ((t - 1.0) / tnew) * (gnew - g)
        return (gnew, ynew, tnew), None

    g0 = jnp.zeros((K, N), D.dtype)
    (g, _, _), _ = lax.scan(step, (g0, g0, jnp.ones(())), None, length=n_iter)
    return g
