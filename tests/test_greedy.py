"""Batched JAX greedy solvers vs NumPy oracle, per patch (SURVEY.md §4.3).

fp32 (JAX) vs fp64 (oracle): tolerances below are measured, not guessed —
greedy support selection is discrete, so once supports agree the coefficient
error is just LS conditioning (~1e-4 on these problems).
"""

import numpy as np
import pytest

from lyssandra_tpu import oracle
from lyssandra_tpu.solvers import batch_omp, group_omp, omp, threshold_code
from tests.conftest import make_problem


def _codes_match(G_jax, G_ref, atol=2e-4):
    """Same supports (allowing fp ties to differ) and close coefficients."""
    G_jax = np.asarray(G_jax, np.float64)
    np.testing.assert_allclose(G_jax, G_ref, atol=atol)


def test_batch_omp_T_mode(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=4)
    ref = oracle.batch_omp(D, X, 4)
    out = batch_omp(D.astype(np.float32), X.astype(np.float32), 4)
    _codes_match(out, ref)


def test_batch_omp_larger(rng):
    D, X, _ = make_problem(rng, p=64, K=256, N=128, T=8)
    ref = oracle.batch_omp(D, X, 8)
    out = batch_omp(D.astype(np.float32), X.astype(np.float32), 8)
    _codes_match(out, ref, atol=5e-4)


def test_omp_matches_oracle(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=4)
    ref = oracle.omp(D, X, 4)
    out = omp(D.astype(np.float32), X.astype(np.float32), 4)
    _codes_match(out, ref)


def test_omp_equals_batch_omp(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=5)
    a = np.asarray(omp(D.astype(np.float32), X.astype(np.float32), 5))
    b = np.asarray(batch_omp(D.astype(np.float32), X.astype(np.float32), 5))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_batch_omp_bf16_selection_parity(rng):
    # corr_dtype='bf16' runs the SELECTION matmul in one bf16 MXU pass;
    # solves stay fp32, so when supports agree, codes agree to LS
    # conditioning.  Pin: identical supports on >=99% of separated lanes,
    # matching coefficients there (bf16 has ~3 decimal digits; synthetic
    # T-sparse problems have well-separated correlation winners).
    D, X, _ = make_problem(rng, p=64, K=256, N=512, T=8)
    Df, Xf = D.astype(np.float32), X.astype(np.float32)
    hi = np.asarray(batch_omp(Df, Xf, 8, refresh="residual"))
    lo = np.asarray(batch_omp(Df, Xf, 8, refresh="residual",
                              corr_dtype="bf16"))
    same_support = ((np.abs(hi) > 1e-12) == (np.abs(lo) > 1e-12)).all(axis=0)
    assert same_support.mean() >= 0.99, same_support.mean()
    np.testing.assert_allclose(
        lo[:, same_support], hi[:, same_support], atol=5e-4
    )


def test_batch_omp_eps_mode(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=5)
    eps = 0.6 * float(np.median(np.linalg.norm(X, axis=0)))
    ref = oracle.batch_omp(D, X, 10, eps=eps)
    out = np.asarray(
        batch_omp(D.astype(np.float32), X.astype(np.float32), 10, eps=eps)
    )
    # identical sparsity pattern counts and close codes
    np.testing.assert_allclose(out, ref, atol=5e-4)
    r = np.linalg.norm(X - D @ out.astype(np.float64), axis=0)
    used = (np.abs(out) > 0).sum(axis=0)
    assert ((r <= eps * (1 + 1e-3)) | (used >= 10)).all()


def test_omp_eps_mode_exact_residual(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=5)
    eps = 0.6 * float(np.median(np.linalg.norm(X, axis=0)))
    out = np.asarray(
        omp(D.astype(np.float32), X.astype(np.float32), 10, eps=eps)
    )
    ref = oracle.omp(D, X, 10, eps=eps)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_compact_result(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=32, T=4)
    res = batch_omp(D.astype(np.float32), X.astype(np.float32), 4, dense=False)
    assert res.idx.shape == (32, 4)
    assert res.gamma.shape == (32, 4)
    assert (np.asarray(res.nsel) == 4).all()
    G = np.asarray(res.dense(48))
    ref = oracle.batch_omp(D, X, 4)
    np.testing.assert_allclose(G, ref, atol=2e-4)
    # err field tracks the true residual
    r2 = np.linalg.norm(X - D @ G.astype(np.float64), axis=0) ** 2
    np.testing.assert_allclose(np.asarray(res.err), r2, atol=1e-3)


def test_group_omp_matches_oracle(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=24, T=4)
    groups = np.repeat(np.arange(12), 4)
    for T in (2, 3):
        ref = oracle.group_omp(D, X, groups, T=T)
        out = np.asarray(
            group_omp(D.astype(np.float32), X.astype(np.float32), groups, T=T)
        )
        np.testing.assert_allclose(out, ref, atol=5e-4)


def test_group_omp_more_steps_than_groups(rng):
    # T > n_groups: oracle no-ops once every group is selected; lanes must
    # freeze instead of re-selecting group 0 (round-1 advisor finding)
    D, X, _ = make_problem(rng, p=16, K=48, N=24, T=4)
    groups = np.repeat(np.arange(4), 12)
    ref = oracle.group_omp(D, X, groups, T=6)
    out = np.asarray(
        group_omp(D.astype(np.float32), X.astype(np.float32), groups, T=6)
    )
    # unions of 12-atom groups exceed p=16 dims -> LS solution non-unique;
    # parity is on the residual (what group OMP minimizes), not the codes
    rr = np.linalg.norm(X - D @ ref, axis=0)
    ro = np.linalg.norm(X - D @ out.astype(np.float64), axis=0)
    np.testing.assert_allclose(ro, rr, atol=1e-4)


def test_group_omp_variable_group_sizes(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=24, T=4)
    groups = np.concatenate(
        [np.zeros(10), np.ones(20), np.full(18, 2)]
    ).astype(int)
    ref = oracle.group_omp(D, X, groups, T=2)
    out = np.asarray(
        group_omp(D.astype(np.float32), X.astype(np.float32), groups, T=2)
    )
    rr = np.linalg.norm(X - D @ ref, axis=0)
    ro = np.linalg.norm(X - D @ out.astype(np.float64), axis=0)
    np.testing.assert_allclose(ro, rr, atol=1e-4)


def test_group_omp_eps_mode(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=24, T=4)
    groups = np.repeat(np.arange(12), 4)
    ref = oracle.group_omp(D, X, groups, T=6, eps=0.5)
    out = np.asarray(
        group_omp(
            D.astype(np.float32), X.astype(np.float32), groups, T=6, eps=0.5
        )
    )
    np.testing.assert_allclose(out, ref, atol=5e-4)


@pytest.mark.slow
def test_group_omp_scales_to_large_K(rng):
    # the point of the block-Cholesky design: per-lane state is
    # O((T*gs)^2), independent of K — the old masked (K, K)-solve design
    # needed O(N K^2) memory and could not run at this size
    p, K, N = 32, 1024, 2048
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.repeat(np.arange(128), 8)
    out = np.asarray(group_omp(D, X, groups, T=3))
    assert np.isfinite(out).all()
    assert ((np.abs(out) > 0).sum(axis=0) <= 24).all()


def test_threshold_matches_oracle(rng):
    D, X, _ = make_problem(rng)
    for kind in ("soft", "hard"):
        ref = oracle.threshold_code(D, X, 0.3, kind)
        out = np.asarray(
            threshold_code(D.astype(np.float32), X.astype(np.float32), 0.3, kind)
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_degenerate_dictionary_frozen_lanes(rng):
    # duplicate atoms: progressive Cholesky breaks down; lanes must freeze,
    # not NaN
    D = rng.standard_normal((8, 4))
    D[:, 2] = D[:, 1]
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((8, 16))
    out = np.asarray(batch_omp(D.astype(np.float32), X.astype(np.float32), 4))
    assert np.isfinite(out).all()


def test_nn_omp_matches_oracle(rng):
    from lyssandra_tpu.solvers import nn_omp

    D, X, _ = make_problem(rng, p=16, K=48, N=24, T=4)
    Xp = np.abs(X)
    ref = oracle.nn_omp(D, Xp, 4)
    out = np.asarray(
        nn_omp(D.astype(np.float32), Xp.astype(np.float32), 4)
    ).astype(np.float64)
    assert (out >= 0).all()
    # supports may differ on marginal atoms (NNLS solver tolerance); compare
    # reconstruction quality instead of exact codes
    r_ref = np.linalg.norm(Xp - D @ ref, axis=0)
    r_out = np.linalg.norm(Xp - D @ out, axis=0)
    assert (r_out <= r_ref + 0.05 * np.linalg.norm(Xp, axis=0)).all()


@pytest.mark.slow
def test_nn_omp_unrolled_matches_scan(rng):
    # the unrolled-step route (default at small T; 2.45x on chip,
    # benchmarks/results/ab_nn_unroll.json) must agree with the scan
    # form: same selections/counts, codes to f32 solver tolerance
    from lyssandra_tpu.solvers import nn_omp

    D, X, _ = make_problem(rng, p=32, K=96, N=64, T=8)
    Xp = np.abs(X).astype(np.float32)
    Df = D.astype(np.float32)
    a = nn_omp(Df, Xp, 8, dense=False, unroll=False)
    b = nn_omp(Df, Xp, 8, dense=False, unroll=True)
    # exact nsel/idx equality only holds on lanes whose residual stays
    # non-negligible: an exactly-representable patch leaves an f32-noise
    # residual whose stop tie (mx <= 0) can resolve differently between
    # the two forms (ADVICE r2) — dense codes and err still agree
    generic = np.asarray(a.err) > 1e-6
    assert np.array_equal(
        np.asarray(a.nsel)[generic], np.asarray(b.nsel)[generic]
    )
    assert np.array_equal(
        np.asarray(a.idx)[generic], np.asarray(b.idx)[generic]
    )
    Ga = np.asarray(a.dense(96))
    Gb = np.asarray(b.dense(96))
    np.testing.assert_allclose(Ga, Gb, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.err), np.asarray(b.err), atol=2e-4
    )


def test_nn_omp_T0(rng):
    # T=0 returns the empty code on both routes (ADVICE r2: the unrolled
    # form crashed — auto-select must send T=0 to the scan form)
    from lyssandra_tpu.solvers import nn_omp

    D, X, _ = make_problem(rng, p=16, K=48, N=8, T=4)
    Xp = np.abs(X).astype(np.float32)
    out = np.asarray(nn_omp(D.astype(np.float32), Xp, 0))
    assert out.shape == (48, 8)
    assert (out == 0).all()
