"""Property-based tests (hypothesis) + numerics guards (SURVEY.md §4.4,
§5 'race detection' analogue: jax_debug_nans over the solver paths)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from lyssandra_tpu import oracle
from lyssandra_tpu.solvers import batch_omp, omp
from lyssandra_tpu.solvers.lasso import feature_sign


def _problem(seed, p, K, N):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N))
    return D.astype(np.float32), X.astype(np.float32)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000), T=st.integers(1, 6))
def test_omp_residual_monotone_and_sparse(seed, T):
    D, X = _problem(seed, p=12, K=24, N=16)
    prev = np.linalg.norm(X, axis=0)
    for t in range(1, T + 1):
        G = np.asarray(batch_omp(D, X, t)).astype(np.float64)
        assert ((G != 0).sum(axis=0) <= t).all()
        r = np.linalg.norm(X - D @ G, axis=0)
        assert (r <= prev + 1e-4).all()
        prev = r


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000),
       lam=st.floats(0.05, 1.0))
def test_feature_sign_kkt_property(seed, lam):
    D, X = _problem(seed, p=12, K=20, N=8)
    G = np.asarray(feature_sign(D, X, lam)).astype(np.float64)
    gr = 2 * (D.T @ (D @ G - X))
    act = np.abs(G) > 1e-8
    assert (np.abs(gr + lam * np.sign(G))[act] < 1e-2).all()
    assert (np.abs(gr[~act]) <= lam + 1e-2).all()


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_omp_equals_oracle_property(seed):
    D, X = _problem(seed, p=12, K=24, N=8)
    ref = oracle.batch_omp(D.astype(np.float64), X.astype(np.float64), 3)
    out = np.asarray(batch_omp(D, X, 3)).astype(np.float64)
    np.testing.assert_allclose(out, ref, atol=5e-3)


@settings(max_examples=8, deadline=None)
@given(seed=st.integers(0, 10_000), T=st.integers(1, 6))
def test_compact_equals_dense_property(seed, T):
    # compact GreedyResult round-trips to the dense scatter bit-for-bit
    # (random shapes/sparsity; the fixed-shape api tests pin one case)
    D, X = _problem(seed, p=12, K=24, N=16)
    res = batch_omp(D, X, T, dense=False)
    dense = np.asarray(batch_omp(D, X, T))
    np.testing.assert_array_equal(np.asarray(res.dense(24)), dense)
    np.testing.assert_allclose(res.to_csc(24).toarray(), dense, atol=0)


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000), T=st.integers(1, 5))
@pytest.mark.slow
def test_lars_t_mode_property(seed, T):
    # T-constrained LARS: <= T nonzeros always; the active gradients sit
    # on a common boundary (knot KKT).  An fp32 homotopy lane that needed
    # an overdue-join heal can stop with an inactive atom above its
    # boundary (documented limitation — the fp64 oracle path rarely
    # does); such lanes must stay RARE, and every other lane must be
    # knot-exact.
    from lyssandra_tpu.solvers.lasso import lars

    D, X = _problem(seed, p=12, K=24, N=8)
    G = np.asarray(lars(D, X, n_nonzero_coefs=T)).astype(np.float64)
    assert ((np.abs(G) > 1e-12).sum(axis=0) <= T).all()
    gr = 2 * (D.T @ (D.astype(np.float64) @ G - X))
    overdue = 0
    for n in range(X.shape[1]):
        act = np.abs(G[:, n]) > 1e-12
        if not act.any():
            continue
        bnd = np.abs(gr[act, n]).max()          # active boundary
        # active atoms all on a common boundary
        assert np.abs(np.abs(gr[act, n]) - bnd).max() < 5e-3 * max(bnd, 1)
        if np.abs(gr[~act, n]).max() > bnd * (1 + 1e-3) + 1e-3:
            overdue += 1                        # healed lane: late join
    assert overdue <= max(1, X.shape[1] // 4), overdue


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_color_fold_roundtrip_property(seed):
    from lyssandra_tpu.ops.patches import (
        extract_patches, reconstruct_from_patches,
    )

    rng = np.random.default_rng(seed)
    img = rng.standard_normal((17, 21, 3)).astype(np.float32)
    X = extract_patches(img, 6)
    rec = np.asarray(reconstruct_from_patches(X, img.shape, 6))
    np.testing.assert_allclose(rec, img, atol=1e-5)


def test_no_nans_under_debug_nans(rng):
    """jax_debug_nans guard (SURVEY §5): the masked-lane freezing must keep
    every intermediate finite, even on degenerate inputs."""
    D = rng.standard_normal((8, 16))
    D[:, 3] = D[:, 2]                 # duplicate atom
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = np.zeros((8, 4))              # all-zero signals
    X[:, 1] = rng.standard_normal(8)
    with jax.debug_nans(True):
        g1 = batch_omp(jnp.asarray(D, jnp.float32),
                       jnp.asarray(X, jnp.float32), 4)
        g2 = omp(jnp.asarray(D, jnp.float32),
                 jnp.asarray(X, jnp.float32), 4)
        g3 = feature_sign(jnp.asarray(D, jnp.float32),
                          jnp.asarray(X, jnp.float32), 0.2)
    for g in (g1, g2, g3):
        assert np.isfinite(np.asarray(g)).all()
