"""Fused feature-sign cold-start kernel (ops/pallas_fs.py) parity.

The kernel must reproduce `_fs_unrolled_state` step for step: same
activation picks, same masks/signs after refinement + line search, same
KKT freeze — fp reassociation differences only (row FMA chains vs
HIGHEST einsums).  Interpreter mode on CPU.
"""

import importlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

lasso = importlib.import_module("lyssandra_tpu.solvers.lasso")

_HI = jax.lax.Precision.HIGHEST


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(1)
    p, K, N = 24, 96, 64
    D = rng.standard_normal((p, K))
    D[:, 50] = D[:, 10] + 0.01 * rng.standard_normal(p)  # coherent pair
    D /= np.linalg.norm(D, axis=0)
    idx0 = rng.integers(0, K, (N, 3))
    X = np.zeros((p, N))
    for j in range(3):
        X += D[:, idx0[:, j]] * rng.standard_normal(N)
    X += 0.05 * rng.standard_normal((p, N))
    X /= np.linalg.norm(X, axis=0)
    return D, X


@pytest.mark.parametrize("lam", [0.05, 0.15])
def test_fs_cold_fused_matches_xla_state(problem, lam):
    D, X = problem
    Dj = jnp.asarray(D, jnp.float32)
    Xj = jnp.asarray(X, jnp.float32)
    Dt, Xt = Dj.T, Xj.T
    A0 = jnp.matmul(Xj.T, Dj, precision=_HI)
    ref = lasso._fs_unrolled_state(
        Dt, Xt, A0, lam, t_unroll=6, n_refine=2, max_active=16)
    fus = lasso._fs_unrolled_state_fused(
        Dt, Xt, A0, lam, t_unroll=6, n_refine=2, max_active=16,
        block=32)
    names = ["idx", "mask", "theta", "gact", "gr", "done", "ovf", "t"]
    for name, a, b in zip(names, ref, fus):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype in (np.bool_, np.int32):
            assert np.array_equal(a, b), name
        else:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_fs_cold_fused_unaligned_shapes(problem):
    """p off the 8-sublane tile and K off the 128-lane tile must be
    zero-padded bitwise-neutrally (ADVICE r3): state parity vs the XLA
    builder at p=21, K=100."""
    rng = np.random.default_rng(7)
    p, K, N = 21, 100, 48
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0)
    X = rng.standard_normal((p, N))
    X /= np.linalg.norm(X, axis=0)
    Dj = jnp.asarray(D, jnp.float32)
    Xj = jnp.asarray(X, jnp.float32)
    Dt, Xt = Dj.T, Xj.T
    A0 = jnp.matmul(Xj.T, Dj, precision=_HI)
    lam = 0.1
    ref = lasso._fs_unrolled_state(
        Dt, Xt, A0, lam, t_unroll=4, n_refine=2, max_active=12)
    fus = lasso._fs_unrolled_state_fused(
        Dt, Xt, A0, lam, t_unroll=4, n_refine=2, max_active=12,
        block=16)
    names = ["idx", "mask", "theta", "gact", "gr", "done", "ovf", "t"]
    for name, a, b in zip(names, ref, fus):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, name
        if a.dtype in (np.bool_, np.int32):
            assert np.array_equal(a, b), name
        else:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_feature_sign_pallas_cold_backend_same_optimum(problem):
    D, X = problem
    Dj = jnp.asarray(D, jnp.float32)
    Xj = jnp.asarray(X, jnp.float32)
    lam = 0.15
    Ga = lasso.feature_sign(Dj, Xj, lam, cold_unroll=6, max_active=16)
    Gb = lasso.feature_sign(Dj, Xj, lam, cold_unroll=6, max_active=16,
                            cold_backend="pallas")

    def obj(G):
        G = np.asarray(G)
        return (np.sum((X - D @ G) ** 2, axis=0)
                + lam * np.sum(np.abs(G), axis=0))

    oa, ob = obj(Ga), obj(Gb)
    rel = np.max(np.abs(oa - ob) / np.maximum(oa, 1e-9))
    assert rel < 1e-5, rel
