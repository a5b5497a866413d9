"""Masked OMP (per-lane observed coordinates) + the inpainting app vs the
fp64 oracle."""

import numpy as np

import jax.numpy as jnp

from lyssandra_tpu import oracle
from lyssandra_tpu.apps import inpaint
from lyssandra_tpu.ops import dct_dictionary
from lyssandra_tpu.solvers import masked_omp
from tests.conftest import make_problem


def test_masked_omp_matches_oracle(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=96, T=3)
    M = (rng.uniform(size=X.shape) > 0.3).astype(np.float64)
    M[:, 0] = 1.0                       # one fully-observed lane
    ref = oracle.masked_omp(D, X, M, 3)
    out = np.asarray(masked_omp(
        D.astype(np.float32), X.astype(np.float32),
        M.astype(np.float32), 3,
    ), np.float64)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_masked_omp_full_mask_equals_omp(rng):
    # all-observed masks must reduce to (norm-selection) OMP of unit-norm
    # atoms, which IS plain OMP
    from lyssandra_tpu.solvers import omp

    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=4)
    M = np.ones_like(X)
    a = np.asarray(masked_omp(D.astype(np.float32), X.astype(np.float32),
                              M.astype(np.float32), 4))
    b = np.asarray(omp(jnp.asarray(D, jnp.float32),
                       jnp.asarray(X, jnp.float32), 4))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_masked_omp_eps_mode(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=64, T=3)
    M = (rng.uniform(size=X.shape) > 0.25).astype(np.float64)
    ref = oracle.masked_omp(D, X, M, 6, eps=0.2)
    out = np.asarray(masked_omp(
        D.astype(np.float32), X.astype(np.float32),
        M.astype(np.float32), 6, eps=0.2,
    ), np.float64)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_inpaint_fills_missing_pixels(rng):
    from lyssandra_tpu.utils import synthetic_image

    img = synthetic_image("smooth", 64, seed=3)
    mask = (rng.uniform(size=img.shape) > 0.25).astype(np.float64)
    corrupted = img * mask
    D = dct_dictionary(8, 64)
    out = np.asarray(inpaint(corrupted, mask, D, T=6))
    miss = mask == 0
    err_before = np.abs(corrupted - img)[miss].mean()
    err_after = np.abs(out - img)[miss].mean()
    assert err_after < 0.25 * err_before, (err_before, err_after)
    # known pixels untouched
    np.testing.assert_allclose(out[mask > 0], img[mask > 0], atol=1e-4)
