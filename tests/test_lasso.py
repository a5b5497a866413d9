"""Feature-sign search + FISTA vs oracle / sklearn (SURVEY.md §4.2, §4.4).

Lasso optima are unique (for generic problems), so instead of bitwise
comparison with the oracle we assert the *objective* matches the oracle's
and the KKT conditions hold — the paper's own optimality criterion.
"""

import numpy as np
import pytest

from lyssandra_tpu import oracle
from lyssandra_tpu.solvers.lasso import feature_sign, fista
from tests.conftest import make_problem


def _objective(D, X, G, lam):
    R = X - D @ G
    return (R * R).sum(axis=0) + lam * np.abs(G).sum(axis=0)


def test_feature_sign_matches_oracle_objective(rng):
    D, X, _ = make_problem(rng, p=16, K=32, N=24, T=3)
    lam = 0.2
    ref = oracle.lasso(D, X, lam)
    out = np.asarray(feature_sign(D, X, lam)).astype(np.float64)
    o_ref = _objective(D, X, ref, lam)
    o_out = _objective(D, X, out, lam)
    np.testing.assert_allclose(o_out, o_ref, rtol=1e-4, atol=1e-5)
    # and the codes themselves agree (unique optimum)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_feature_sign_kkt(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=32, T=4)
    lam = 0.15
    res = feature_sign(D, X, lam, full_result=True)
    assert bool(np.asarray(res.done).all())
    assert not bool(np.asarray(res.overflow).any())
    G = np.asarray(res.Gamma).astype(np.float64)
    gr = 2 * (D.T @ (D @ G - X))
    act = np.abs(G) > 1e-10
    viol_act = np.abs(gr + lam * np.sign(G))[act]
    assert viol_act.max() < 1e-3
    assert (np.abs(gr[~act]) <= lam + 1e-3).all()


def test_feature_sign_zero_solution(rng):
    D, X, _ = make_problem(rng, p=16, K=32, N=8, T=2)
    lam = 1e3  # lam > 2 max|D^T x| => g = 0 optimal
    G = np.asarray(feature_sign(D, X, lam))
    assert (G == 0).all()


def test_feature_sign_vs_sklearn(rng):
    from sklearn.linear_model import Lasso

    D, X, _ = make_problem(rng, p=16, K=32, N=8, T=3)
    lam = 0.2
    out = np.asarray(feature_sign(D, X, lam)).astype(np.float64)
    for n in range(X.shape[1]):
        sk = Lasso(alpha=lam / (2 * D.shape[0]), fit_intercept=False,
                   max_iter=50000, tol=1e-12).fit(D, X[:, n])
        obj = lambda w: np.sum((X[:, n] - D @ w) ** 2) + lam * np.abs(w).sum()
        assert obj(out[:, n]) <= obj(sk.coef_) + 1e-4


def test_feature_sign_compaction_matches_uncompacted(rng):
    # straggler compaction (VERDICT r1 #4) permutes lanes between
    # segments but must not change any lane's result.  Mixed difficulty:
    # easy exact-sparse lanes + dense hard lanes so compaction triggers.
    D, Xe, _ = make_problem(rng, p=16, K=48, N=40, T=2)
    Xh = rng.standard_normal((16, 24)) * 2.0          # hard dense lanes
    X = np.concatenate([Xe, Xh], axis=1)
    lam = 0.1
    a = np.asarray(feature_sign(D, X, lam, max_iter=48,
                                compact_stragglers=False))
    b = np.asarray(feature_sign(D, X, lam, max_iter=48,
                                compact_stragglers=True))
    o_a = _objective(D, X, a.astype(np.float64), lam)
    o_b = _objective(D, X, b.astype(np.float64), lam)
    np.testing.assert_allclose(o_b, o_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b, a, atol=2e-3)


def test_fista_objective(rng):
    D, X, _ = make_problem(rng, p=16, K=32, N=16, T=3)
    lam = 0.2
    ref = oracle.lasso(D, X, lam)
    out = np.asarray(fista(D, X, lam, n_iter=500)).astype(np.float64)
    o_ref = _objective(D, X, ref, lam)
    o_out = _objective(D, X, out, lam)
    np.testing.assert_allclose(o_out, o_ref, rtol=1e-3, atol=1e-4)


def test_lars_matches_feature_sign(rng):
    from lyssandra_tpu.solvers.lasso import lars

    D, X, _ = make_problem(rng, p=16, K=32, N=16, T=3)
    lam = 0.2
    ref = oracle.lasso(D, X, lam)
    out = np.asarray(lars(D, X, lam)).astype(np.float64)
    o_ref = _objective(D, X, ref, lam)
    o_out = _objective(D, X, out, lam)
    np.testing.assert_allclose(o_out, o_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_lars_vs_sklearn_lassolars(rng):
    from sklearn.linear_model import LassoLars

    from lyssandra_tpu.solvers.lasso import lars

    D, X, _ = make_problem(rng, p=16, K=32, N=8, T=3)
    lam = 0.3
    out = np.asarray(lars(D, X, lam)).astype(np.float64)
    for n in range(X.shape[1]):
        sk = LassoLars(alpha=lam / (2 * D.shape[0]), fit_intercept=False,
                       max_iter=10000).fit(D, X[:, n])
        np.testing.assert_allclose(out[:, n], sk.coef_, atol=5e-3)


def test_lars_t_mode_vs_sklearn(rng):
    # n_nonzero_coefs stopping (VERDICT r1 #6).  fp32 near-tie event
    # reordering makes knot-INDEX alignment with fp64 sklearn fragile, so
    # the pin is (a) every lane's result is a lasso solution at its own
    # stopping penalty (homotopy-knot KKT), (b) it matches the sklearn
    # path point at the SAME penalty.
    from sklearn.linear_model import lars_path as sk_lars_path

    from lyssandra_tpu.solvers.lasso import lars

    D, X, _ = make_problem(rng, p=16, K=32, N=12, T=3)
    T = 4
    out = np.asarray(lars(D, X, n_nonzero_coefs=T)).astype(np.float64)
    assert ((np.abs(out) > 1e-12).sum(axis=0) <= T).all()
    G = D.T @ D
    A0 = D.T @ X
    gr = 2 * (G @ out - A0)                     # d/dg of ||x - Dg||^2
    for n in range(X.shape[1]):
        g = out[:, n]
        act = np.abs(g) > 1e-12
        assert act.sum() >= 1
        lam_star = np.abs(gr[:, n]).max()
        # knot KKT: every active atom sits on the |corr| = lam* boundary
        assert np.abs(np.abs(gr[act, n]) - lam_star).max() < 5e-3
        # sign consistency only for MATERIALLY nonzero coefficients: a
        # lane whose T-stop fires at a knot where another atom is AT its
        # leave crossing carries that atom at +-fp-noise (~1e-8), whose
        # sign is rounding luck, not a KKT violation
        mat = np.abs(g) > 1e-6
        assert (gr[mat, n] * np.sign(g[mat]) < 0).all()
        # lambda-matched sklearn comparison
        alphas, _, coefs = sk_lars_path(
            D, X[:, n], method="lasso", alpha_min=0.0
        )
        a_star = lam_star / (2 * D.shape[0])
        i = int(np.argmin(np.abs(alphas - a_star)))
        if abs(alphas[i] - a_star) < 1e-5:      # same knot found
            np.testing.assert_allclose(g, coefs[:, i], atol=5e-3)


def test_lars_path_knots_match_sklearn(rng):
    # per-knot KKT self-consistency + lambda-matched sklearn comparison
    from sklearn.linear_model import lars_path as sk_lars_path

    from lyssandra_tpu.solvers.lasso import lars_path

    D, X, _ = make_problem(rng, p=16, K=24, N=6, T=3)
    path = lars_path(D, X, 0.05, max_steps=32)
    dense = np.asarray(path.dense(24)).astype(np.float64)   # (S, K, N)
    keep = np.asarray(path.keep)
    lam = np.asarray(path.lambdas)
    G = D.T @ D
    A0 = D.T @ X
    matched = 0
    for n in range(X.shape[1]):
        alphas, _, coefs = sk_lars_path(
            D, X[:, n], method="lasso", alpha_min=0.05 / (2 * D.shape[0])
        )
        for s in np.where(keep[:, n])[0][1:]:
            g = dense[s, :, n]
            l_s = lam[s, n]
            gr = 2 * (G @ g - A0[:, n])
            act = np.abs(g) > 1e-10
            # active atoms on the boundary, inactive inside it
            if act.any():
                assert np.abs(np.abs(gr[act]) - l_s).max() < 5e-3, (n, s)
            assert (np.abs(gr[~act]) <= l_s + 5e-3).all(), (n, s)
            # sklearn knot at (numerically) the same penalty -> same coefs
            a_s = l_s / (2 * D.shape[0])
            i = int(np.argmin(np.abs(alphas - a_s)))
            if abs(alphas[i] - a_s) < 1e-5:
                np.testing.assert_allclose(g, coefs[:, i], atol=5e-3)
                matched += 1
    assert matched >= 10   # the lambda matching must actually exercise


def test_lars_path_t_mode_consistent(rng):
    # the path's last fresh knot in T-mode equals the T-mode solve
    from lyssandra_tpu.solvers.lasso import lars, lars_path

    D, X, _ = make_problem(rng, p=16, K=32, N=8, T=3)
    T = 3
    sol = np.asarray(lars(D, X, n_nonzero_coefs=T))
    path = lars_path(D, X, n_nonzero_coefs=T, max_steps=48)
    dense = np.asarray(path.dense(32))
    keep = np.asarray(path.keep)
    for n in range(X.shape[1]):
        last = np.where(keep[:, n])[0][-1]
        np.testing.assert_allclose(
            dense[last, :, n], sol[:, n], atol=1e-5
        )


def test_lars_zero_and_path_ends(rng):
    from lyssandra_tpu.solvers.lasso import lars

    D, X, _ = make_problem(rng, p=16, K=32, N=8, T=2)
    # lam above lambda_max: exactly zero
    G0 = np.asarray(lars(D, X, 1e4))
    assert (G0 == 0).all()
    # KKT at a moderate lam
    lam = 0.25
    G = np.asarray(lars(D, X, lam, full_result=True)[0]).astype(np.float64)
    gr = 2 * (D.T @ (D @ G - X))
    act = np.abs(G) > 1e-8
    assert (np.abs(gr + lam * np.sign(G))[act] < 5e-3).all()
    assert (np.abs(gr[~act]) <= lam + 5e-3).all()


@pytest.mark.slow
def test_lars_cold_unroll_same_solution(rng):
    """The unrolled growing-dimension homotopy cold start (cold_unroll,
    VERDICT r2 task #7) follows the same path as the wide while_loop:
    same optimum at fixed lam, same T-constrained knot solutions, and
    sklearn LassoLars parity — both in a generic and a planted-sparse
    regime."""
    from lyssandra_tpu.solvers.lasso import lars

    D, X, _ = make_problem(rng, p=16, K=32, N=16, T=3)
    lam = 0.2
    base = np.asarray(lars(D, X, lam, polish=False)).astype(np.float64)
    unr = np.asarray(
        lars(D, X, lam, polish=False, cold_unroll=8)
    ).astype(np.float64)
    o_b = _objective(D, X, base, lam)
    o_u = _objective(D, X, unr, lam)
    np.testing.assert_allclose(o_u, o_b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(unr, base, atol=1e-3)

    # planted-sparse regime + T-constrained mode
    p, K, N = 48, 128, 64
    Dc = rng.standard_normal((p, K))
    Dc /= np.linalg.norm(Dc, axis=0, keepdims=True)
    G_true = np.zeros((K, N))
    for n in range(N):
        sup = rng.choice(K, size=5, replace=False)
        G_true[sup, n] = rng.standard_normal(5)
    Xc = (Dc @ G_true + 0.01 * rng.standard_normal((p, N)))
    Dc, Xc = Dc.astype(np.float32), Xc.astype(np.float32)
    lam = 0.25
    base = np.asarray(lars(Dc, Xc, lam, polish=False)).astype(np.float64)
    unr = np.asarray(
        lars(Dc, Xc, lam, polish=False, cold_unroll=8)
    ).astype(np.float64)
    np.testing.assert_allclose(
        _objective(Dc, Xc, unr, lam), _objective(Dc, Xc, base, lam),
        rtol=1e-5, atol=1e-5,
    )
    # T-mode: <= T nonzeros and identical knot solutions
    bT = np.asarray(lars(Dc, Xc, n_nonzero_coefs=4)).astype(np.float64)
    uT = np.asarray(
        lars(Dc, Xc, n_nonzero_coefs=4, cold_unroll=8)
    ).astype(np.float64)
    assert ((np.abs(uT) > 1e-12).sum(axis=0) <= 4).all()
    np.testing.assert_allclose(uT, bT, atol=2e-3)


def test_encoder_fista_route(rng):
    # 'fista' through the SparseEncoder facade reaches the lasso optimum
    from lyssandra_tpu.solvers.encoder import SparseEncoder

    D, X, _ = make_problem(rng, p=16, K=32, N=24, T=3)
    lam = 0.2
    ref = oracle.lasso(D, X, lam)
    out = np.asarray(
        SparseEncoder("fista", {"lam": lam, "n_iter": 500},
                      check_atoms=False).encode(X, D)
    ).astype(np.float64)
    np.testing.assert_allclose(
        _objective(D, X, out, lam), _objective(D, X, ref, lam),
        rtol=1e-3, atol=1e-4,
    )


def test_encoder_lasso_and_lars_routes(rng):
    # these facade routes were broken (AttributeError: the package's
    # `lasso` re-export shadows the submodule) until the fista route
    # exposed it — pin all three against the oracle objective
    from lyssandra_tpu.solvers.encoder import SparseEncoder

    D, X, _ = make_problem(rng, p=16, K=32, N=24, T=3)
    lam = 0.2
    o_ref = _objective(D, X, oracle.lasso(D, X, lam), lam)
    for alg in ("lasso", "lars"):
        out = np.asarray(
            SparseEncoder(alg, {"lam": lam}, check_atoms=False).encode(X, D)
        ).astype(np.float64)
        np.testing.assert_allclose(
            _objective(D, X, out, lam), o_ref, rtol=1e-3, atol=1e-4,
            err_msg=alg,
        )


def test_feature_sign_warm_start_same_optimum(rng):
    """Warm-seeded feature-sign (both FISTA-iterate and OMP-support
    seeds) reaches the same (unique) optimum as the cold start; the
    FISTA seed additionally needs no more outer iterations."""
    D, X, _ = make_problem(rng, p=24, K=64, N=48, T=5)
    lam = 0.15
    cold = feature_sign(D, X, lam, warm_start=0, full_result=True)
    o_cold = _objective(D, X, np.asarray(cold.Gamma, np.float64), lam)
    warm = feature_sign(D, X, lam, warm_start=40, warm_seed="fista",
                        full_result=True)
    assert bool(np.asarray(warm.done).all())
    o_warm = _objective(D, X, np.asarray(warm.Gamma, np.float64), lam)
    np.testing.assert_allclose(o_warm, o_cold, rtol=1e-5, atol=1e-5)
    assert int(warm.n_iter) <= int(cold.n_iter)
    # the r6 default: a 4-atom batch_omp seed (ab_fs_ompseed.json)
    womp = feature_sign(D, X, lam, warm_start=4, warm_seed="omp",
                        full_result=True)
    assert bool(np.asarray(womp.done).all())
    o_womp = _objective(D, X, np.asarray(womp.Gamma, np.float64), lam)
    np.testing.assert_allclose(o_womp, o_cold, rtol=1e-5, atol=1e-5)


def test_feature_sign_warm_start_coherent_dictionary(rng):
    """Regression (config4 r4): on a COHERENT dictionary the n_warm-step
    FISTA iterate is still dense, and an ungated warm start filled every
    active-set slot — lanes then froze as 'overflow' before refinement
    could prune, falling to the dense polish (avg_nnz 4.5 -> 65).  The
    warm init must gate such lanes back to a cold start and the solver
    must reach the cold optimum with no overflow flags."""
    p, K, N = 32, 128, 64
    base = rng.standard_normal((p, 4))
    D = np.repeat(base, K // 4, axis=1) + 0.15 * rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    D = D.astype(np.float32)
    G_true = np.zeros((K, N))
    for n in range(N):
        sup = rng.choice(K, size=4, replace=False)
        G_true[sup, n] = rng.standard_normal(4)
    X = (D @ G_true + 0.01 * rng.standard_normal((p, N))).astype(np.float32)
    lam = 0.1
    cold = feature_sign(D, X, lam, warm_start=0, max_active=16,
                        full_result=True)
    warm = feature_sign(D, X, lam, warm_start=40, warm_seed="fista",
                        max_active=16, full_result=True)
    assert not bool(np.asarray(warm.overflow).any())
    assert bool(np.asarray(warm.done).all())
    o_cold = _objective(D, X, np.asarray(cold.Gamma, np.float64), lam)
    o_warm = _objective(D, X, np.asarray(warm.Gamma, np.float64), lam)
    np.testing.assert_allclose(o_warm, o_cold, rtol=1e-4, atol=1e-4)
    nnz = (np.abs(np.asarray(warm.Gamma)) > 1e-10).sum(axis=0)
    assert nnz.mean() < 16


@pytest.mark.slow
def test_feature_sign_cold_unroll_same_optimum(rng):
    """The unrolled growing-dimension cold start (cold_unroll > 0,
    nn_omp's r7 trick ported to the convex path) reaches the same
    unique optimum as the plain cold start — both in a generic regime
    and in the sparse config-4-like regime it targets, and on a
    coherent dictionary where activations churn."""
    D, X, _ = make_problem(rng, p=24, K=64, N=48, T=5)
    lam = 0.15
    cold = feature_sign(D, X, lam, warm_start=0, full_result=True)
    o_cold = _objective(D, X, np.asarray(cold.Gamma, np.float64), lam)
    unr = feature_sign(D, X, lam, warm_start=0, cold_unroll=6,
                       full_result=True)
    assert bool(np.asarray(unr.done).all())
    o_unr = _objective(D, X, np.asarray(unr.Gamma, np.float64), lam)
    np.testing.assert_allclose(o_unr, o_cold, rtol=1e-5, atol=1e-5)

    # sparse planted-support regime (the config-4 operating point)
    p, K, N = 48, 128, 96
    Dc = rng.standard_normal((p, K))
    Dc /= np.linalg.norm(Dc, axis=0, keepdims=True)
    G_true = np.zeros((K, N))
    for n in range(N):
        sup = rng.choice(K, size=5, replace=False)
        G_true[sup, n] = rng.standard_normal(5)
    Xc = (Dc @ G_true + 0.01 * rng.standard_normal((p, N)))
    Dc, Xc = Dc.astype(np.float32), Xc.astype(np.float32)
    lam = 0.3
    cold = feature_sign(Dc, Xc, lam, warm_start=0, full_result=True)
    unr = feature_sign(Dc, Xc, lam, warm_start=0, cold_unroll=6,
                       full_result=True)
    assert bool(np.asarray(unr.done).all())
    o_cold = _objective(Dc, Xc, np.asarray(cold.Gamma, np.float64), lam)
    o_unr = _objective(Dc, Xc, np.asarray(unr.Gamma, np.float64), lam)
    np.testing.assert_allclose(o_unr, o_cold, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_feature_sign_auto_capacity_with_overflow_lanes(rng):
    """Auto capacity: the batch runs at a 16-slot active-set width; the
    few lanes that genuinely need more active atoms overflow the narrow
    width and must be re-solved exactly at full capacity — the final
    result must match the fixed-capacity path (same unique optimum),
    with no surviving overflow flags."""
    p, K, N = 32, 128, 512
    D, X, _ = make_problem(rng, p=p, K=K, N=N, T=3, dtype=np.float32)
    lam = 0.05
    # two dense lanes: combinations of 40 atoms -> the lasso solution
    # needs more than the 16 narrow-width slots
    for n in (100, 300):
        sup = rng.choice(K, size=40, replace=False)
        g = rng.standard_normal(40) * 2.0
        X[:, n] = (D[:, sup] @ g).astype(np.float32)

    auto = feature_sign(D, X, lam, full_result=True, auto_capacity=True)
    fixed = feature_sign(D, X, lam, full_result=True, auto_capacity=False)
    assert bool(np.asarray(auto.done).all())
    assert not bool(np.asarray(auto.overflow).any())
    o_auto = _objective(D, X, np.asarray(auto.Gamma, np.float64), lam)
    o_fixed = _objective(D, X, np.asarray(fixed.Gamma, np.float64), lam)
    np.testing.assert_allclose(o_auto, o_fixed, rtol=1e-4, atol=1e-4)
    # the dense lanes really exceeded the narrow width
    nnz = (np.abs(np.asarray(auto.Gamma)) > 1e-10).sum(axis=0)
    assert nnz[100] > 14 and nnz[300] > 14


@pytest.mark.slow
def test_feature_sign_multi_activation_same_optimum(rng):
    """n_activate>1 joins the top-k KKT violators per outer iteration
    instead of one; the lasso minimizer is path-independent, so every
    width must reach the cold single-activation optimum, and a capped CG
    budget (max_cg) must not change the optimum either (the warm-started
    solve accumulates accuracy across refinements; the KKT exit check is
    unchanged).  No iteration-count assertion: wider activation can join
    junk atoms that churn (join -> prune -> rejoin), which is exactly why
    it is opt-in (chip A/B ab_fs_activate.json) — only the optimum is
    invariant."""
    D, X, _ = make_problem(rng, p=24, K=96, N=64, T=6)
    lam = 0.12
    base = feature_sign(D, X, lam, full_result=True)
    assert bool(np.asarray(base.done).all())
    o_base = _objective(D, X, np.asarray(base.Gamma, np.float64), lam)
    for n_act, cg in ((2, 32), (4, 32), (8, 32), (4, 8), (1, 8)):
        out = feature_sign(D, X, lam, full_result=True,
                           n_activate=n_act, max_cg=cg)
        assert bool(np.asarray(out.done).all()), (n_act, cg)
        o = _objective(D, X, np.asarray(out.Gamma, np.float64), lam)
        np.testing.assert_allclose(o, o_base, rtol=1e-4, atol=1e-5,
                                   err_msg=f"act{n_act}_cg{cg}")


def test_carried_masked_gr_invariant_all_producers():
    """_fs_loop's outer_step CARRIES the gradient zeroed at active slots
    (it doubles as the next activation score) and never rebuilds the
    membership mask — so every state producer must hand off gr EXACTLY
    ZERO at its (idx, mask) slots.  The invariant is upheld at four
    producer sites by convention (ADVICE r4); this pins it directly so a
    future producer/kernel change fails here instead of as silent lane
    limit-cycling (an unmasked active slot can re-win the activation
    argmax forever)."""
    import jax
    import jax.numpy as jnp

    from lyssandra_tpu.solvers.lasso import (
        _active_mask, _fs_fista_iterate, _fs_init, _fs_omp_seed_iterate,
        _fs_unrolled_state, _fs_unrolled_state_fused, _fs_warm_state,
    )

    _HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(3)
    # coherent pair + 3-atom signals: warm/unrolled states activate real
    # supports, so the masked-slot assertion is exercised, not vacuous
    p, K, N, A = 24, 96, 64, 16
    D = rng.standard_normal((p, K))
    D[:, 50] = D[:, 10] + 0.01 * rng.standard_normal(p)
    D /= np.linalg.norm(D, axis=0)
    idx0 = rng.integers(0, K, (N, 3))
    X = np.zeros((p, N))
    for j in range(3):
        X += D[:, idx0[:, j]] * rng.standard_normal(N)
    X += 0.05 * rng.standard_normal((p, N))
    X /= np.linalg.norm(X, axis=0)
    lam = 0.15
    Dj = jnp.asarray(D, jnp.float32)
    Dt = Dj.T
    Xt = jnp.asarray(X.T, jnp.float32)
    A0 = jnp.matmul(Xt, Dj, precision=_HI)

    states = {
        "init": _fs_init(A0, lam, A),
        "warm_fista": _fs_warm_state(
            _fs_fista_iterate(Dj, Xt, A0, lam, n_warm=20),
            Dt, Xt, A0, lam, max_active=A),
        "warm_fista_ungated": _fs_warm_state(
            _fs_fista_iterate(Dj, Xt, A0, lam, n_warm=20),
            Dt, Xt, A0, lam, max_active=A, gate=False),
        "warm_omp": _fs_warm_state(
            _fs_omp_seed_iterate(Dj, Xt, 4),
            Dt, Xt, A0, lam, max_active=A),
        "unrolled_xla": _fs_unrolled_state(
            Dt, Xt, A0, lam, t_unroll=6, n_refine=2, max_active=A),
        "unrolled_fused": _fs_unrolled_state_fused(
            Dt, Xt, A0, lam, t_unroll=6, n_refine=2, max_active=A,
            block=32),
    }
    for name, st in states.items():
        idx, mask, _theta, _gact, gr, _done, _ovf, _it = st
        act = np.asarray(_active_mask(idx, mask, K))
        grn = np.asarray(gr)
        assert (grn[act] == 0.0).all(), name
        if name != "init":
            # non-cold producers must have real active slots (else the
            # assertion above is vacuous) and real scores elsewhere
            assert act.any(), name
            assert np.abs(grn[~act]).max() > 0.0, name
