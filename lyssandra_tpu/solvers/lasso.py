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
    G, A0, xnormsq, lam, state, *, max_active, max_iter, max_inner
):
    """One SEGMENT of up to max_iter outer iterations from ``state``
    (None-initialized by the wrapper).  Segmenting keeps each device
    program short — a single unbounded while_loop can exceed the TPU
    worker's kernel watchdog on dense problems (see ``feature_sign``).

    G = D^T D (K, K); A0 = D^T X as (N, K); xnormsq (N,)."""
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

    it0 = state[-1]

    def outer_cond(st):
        *_, done, _, it = st
        return (it - it0 < max_iter) & ~jnp.all(done)

    st = lax.while_loop(outer_cond, outer_step, state)
    idx, mask, theta, gact, done, overflow, it = st
    gfull = dense(idx, mask, gact)
    return st, FeatureSignResult(gfull.T, it, done, overflow)


def _fs_init(A0, lam, A):
    N = A0.shape[0]
    # lanes where g = 0 already satisfies the KKT conditions:
    # |grad| = |2 D^T x| <= lam everywhere
    done0 = jnp.all(2.0 * jnp.abs(A0) <= lam + 1e-12, axis=1)
    return (
        jnp.zeros((N, A), jnp.int32),
        jnp.zeros((N, A), bool),
        jnp.zeros((N, A), A0.dtype),
        jnp.zeros((N, A), A0.dtype),
        done0,
        jnp.zeros((N,), bool),
        jnp.zeros((), jnp.int32),
    )


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
    import numpy as np

    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    G = jnp.matmul(D.T, D, precision=_HI)
    A0 = jnp.matmul(X.T, D, precision=_HI)
    xnormsq = jnp.sum(X * X, axis=0)
    # run in segments of <= 16 outer iterations per device program: one
    # monolithic while_loop can run minutes of device time on dense
    # problems and trip the TPU worker's kernel watchdog
    seg = min(16, max_iter)
    state = _fs_init(A0, float(lam), max_active)
    res = None
    for _ in range((max_iter + seg - 1) // seg):
        state, res = _feature_sign_impl(
            G, A0, xnormsq, float(lam), state,
            max_active=max_active, max_iter=seg, max_inner=max_inner,
        )
        if bool(np.asarray(jnp.all(res.done))):
            break
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


@functools.partial(
    jax.jit, static_argnames=("max_active", "max_steps")
)
def _lars_impl(G, A0, lam, state, *, max_active, max_steps):
    """Batched LARS-lasso homotopy for min ||x - Dg||^2 + lam |g|_1.

    Along the regularization path the active coefficients are linear in the
    (decreasing) penalty lt:  g_A(lt) = c_A - lt * w_A  with
    c_A = Gram_A^{-1} a0_A and w_A = Gram_A^{-1} theta_A / 2, and the
    inactive correlations 2(a0 - G_A g_A) are linear in lt too — so each
    homotopy segment is one batched masked solve plus closed-form event
    times (join: |corr| hits lt; leave: coefficient crosses 0).  Fixed
    ``max_steps`` segments, per-lane done masks (SURVEY.md 'LARS / lasso
    wrappers' — the reference delegates to sklearn; this is the native
    batched rebuild; sklearn stays a test oracle).
    """
    N, K = A0.shape
    A = max_active
    eyeA = jnp.eye(A, dtype=A0.dtype)
    iotaK = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    BIG = jnp.asarray(3.4e38, A0.dtype)

    def step(st):
        idx, mask, theta, gact, lt, done, it = st
        maskf = mask.astype(A0.dtype)
        M = _gather_gram(G, idx)
        M = M * maskf[:, :, None] * maskf[:, None, :]
        Mp = jnp.where(
            (maskf[:, :, None] * maskf[:, None, :]) > 0, M, eyeA[None]
        ) + 1e-6 * eyeA[None]
        a0sel = jnp.take_along_axis(A0, idx, axis=1) * maskf
        sol = jnp.linalg.solve(
            Mp, jnp.stack([a0sel, theta / 2.0], axis=-1)
        )
        cA = sol[..., 0] * maskf            # g at lt = 0
        wA = sol[..., 1] * maskf            # dg/dlt (negated)

        # inactive correlations, linear in lt: corr_j(lt) = u_j + lt*v_j
        is_act = jnp.zeros((N, K), bool).at[
            jnp.arange(N)[:, None], idx
        ].max(mask)
        GA = jnp.take(G, idx.reshape(-1), axis=0).reshape(N, A, K)
        u = 2.0 * (A0 - jnp.einsum("na,nak->nk", cA, GA))
        v = 2.0 * jnp.einsum("na,nak->nk", wA, GA)

        # join events: u + lt*v = +-lt  =>  lt = u / (+-1 - v)
        ltp = u / jnp.maximum(1.0 - v, 1e-12)
        ltm = u / jnp.minimum(-1.0 - v, -1e-12)
        cand = jnp.where(
            is_act, -BIG, jnp.maximum(
                jnp.where((ltp < lt[:, None] - 1e-6) & (ltp > 0), ltp, -BIG),
                jnp.where((ltm < lt[:, None] - 1e-6) & (ltm > 0), ltm, -BIG),
            )
        )
        lt_join = jnp.max(cand, axis=1)
        k_join = jnp.min(
            jnp.where(cand == lt_join[:, None], iotaK, K), axis=1
        ).astype(jnp.int32)

        # leave events: cA - lt*wA = 0 => lt = cA/wA (crossing as lt falls)
        ltz = jnp.where(
            mask & (jnp.abs(wA) > 1e-12), cA / jnp.where(
                jnp.abs(wA) > 1e-12, wA, 1.0
            ), -BIG
        )
        ltz = jnp.where((ltz < lt[:, None] - 1e-6) & (ltz > 0), ltz, -BIG)
        lt_leave = jnp.max(ltz, axis=1)
        s_leave = jnp.argmax(jnp.where(ltz == lt_leave[:, None],
                                       1.0, 0.0), axis=1)

        lt_next = jnp.maximum(jnp.maximum(lt_join, lt_leave), lam)
        finished = lt_next <= lam + 1e-9

        gact_new = (cA - lt_next[:, None] * wA) * maskf

        do_join = (~finished) & (lt_join >= lt_leave)
        do_leave = (~finished) & ~do_join

        # join: put k_join into the first free slot
        free = jnp.argmin(mask.astype(jnp.int32), axis=1).astype(jnp.int32)
        no_free = jnp.all(mask, axis=1)
        join_ok = do_join & ~no_free
        slot_hot = (jax.nn.one_hot(free, A, dtype=bool)
                    & join_ok[:, None])
        corr_at = jnp.take_along_axis(u + lt_next[:, None] * v,
                                      k_join[:, None], 1)[:, 0]
        idx2 = jnp.where(slot_hot, k_join[:, None], idx)
        mask2 = mask | slot_hot
        theta2 = jnp.where(slot_hot, jnp.sign(corr_at)[:, None], theta)
        gact2 = jnp.where(slot_hot, 0.0, gact_new)

        # leave: clear the crossing slot
        leave_hot = (jax.nn.one_hot(s_leave, A, dtype=bool)
                     & do_leave[:, None])
        mask3 = mask2 & ~leave_hot
        theta3 = jnp.where(leave_hot, 0.0, theta2)
        gact3 = jnp.where(leave_hot, 0.0, gact2)

        newly_done = finished | (do_join & no_free)
        fz = lambda new, old: jnp.where(done[:, None], old, new)
        return (
            fz(idx2, idx), fz(mask3, mask), fz(theta3, theta),
            fz(gact3, gact),
            jnp.where(done, lt, lt_next),
            done | newly_done, it + 1,
        )

    it0 = state[-1]

    def cond(st):
        *_, done, it = st
        return (it - it0 < max_steps) & ~jnp.all(done)

    st = lax.while_loop(cond, step, state)
    idx, mask, theta, gact, lt, done, _ = st
    Gd = jnp.zeros((N, K), A0.dtype).at[
        jnp.arange(N)[:, None], idx
    ].add(jnp.where(mask, gact, 0.0))
    return st, (Gd.T, done)


def _lars_init(A0, lam, A):
    """lt = lambda_max = max 2|a0|; activate the argmax atom."""
    N, K = A0.shape
    iotaK = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    c0 = 2.0 * jnp.abs(A0)
    lt0 = jnp.max(c0, axis=1)
    k0 = jnp.min(jnp.where(c0 == lt0[:, None], iotaK, K), axis=1)
    k0 = k0.astype(jnp.int32)
    idx = jnp.zeros((N, A), jnp.int32).at[:, 0].set(k0)
    mask = jnp.zeros((N, A), bool).at[:, 0].set(True)
    theta = jnp.zeros((N, A), A0.dtype).at[:, 0].set(
        jnp.sign(jnp.take_along_axis(A0, k0[:, None], 1)[:, 0])
    )
    gact = jnp.zeros((N, A), A0.dtype)
    done0 = lt0 <= lam          # target penalty at/above lambda_max: g = 0
    return (idx, mask, theta, gact, lt0, done0, jnp.zeros((), jnp.int32))


def lars(
    D: jax.Array, X: jax.Array, lam: float,
    *, max_active: int = 64, max_steps: int = 256,
    full_result: bool = False, polish: bool = True,
):
    """Batched LARS-lasso (homotopy) solver for the lasso objective
    ||x - D g||^2 + lam ||g||_1 — same optimum as feature_sign, reached by
    tracing the regularization path from lambda_max down to lam.

    fp32 homotopy is path-sensitive: a ~1-ulp perturbation can reorder two
    nearby events and strand a lane short of its KKT point.  With
    ``polish`` (default), lanes whose final KKT residual violates lam get
    re-solved with FISTA and the better objective wins.
    """
    import numpy as np

    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    G = jnp.matmul(D.T, D, precision=_HI)
    A0 = jnp.matmul(X.T, D, precision=_HI)
    # segmented launches (<= 32 homotopy steps each) — see feature_sign
    seg = min(32, max_steps)
    state = _lars_init(A0, float(lam), max_active)
    Gamma = done = None
    for _ in range((max_steps + seg - 1) // seg):
        state, (Gamma, done) = _lars_impl(
            G, A0, float(lam), state,
            max_active=max_active, max_steps=seg,
        )
        if bool(np.asarray(jnp.all(done))):
            break
    if polish:
        gr = 2.0 * (jnp.matmul(G, Gamma, precision=_HI) - A0.T)
        act = jnp.abs(Gamma) > 1e-8
        viol = jnp.where(
            act, jnp.abs(gr + lam * jnp.sign(Gamma)),
            jnp.maximum(jnp.abs(gr) - lam, 0.0),
        ).max(axis=0)
        bad = ~done | (viol > 1e-2 * max(lam, 1.0))
        if bool(jnp.any(bad)):
            Gf = fista(D, X, lam, n_iter=500)

            def obj(Gm):
                R = X - jnp.matmul(D, Gm, precision=_HI)
                return jnp.sum(R * R, axis=0) + lam * jnp.sum(
                    jnp.abs(Gm), axis=0
                )

            take = bad & (obj(Gf) < obj(Gamma))
            Gamma = jnp.where(take[None, :], Gf, Gamma)
            done = done | take
    return (Gamma, done) if full_result else Gamma


lasso_lars = lars  # reference-style alias (sklearn LassoLars wrapper name)


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
