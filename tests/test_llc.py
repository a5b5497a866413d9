"""LLC encoder vs the fp64 per-signal oracle (SURVEY.md §2.1
feature-extraction toolkit: LLC-style coding)."""

import numpy as np

import jax.numpy as jnp

from lyssandra_tpu import oracle
from lyssandra_tpu.solvers import SparseEncoder, llc
from tests.conftest import make_problem


def test_llc_matches_oracle(rng):
    D, X, _ = make_problem(rng, p=16, K=64, N=128, T=4)
    ref = oracle.llc(D, X, knn=5, lam=1e-4)
    out = np.asarray(llc(D.astype(np.float32), X.astype(np.float32),
                         knn=5, lam=1e-4), np.float64)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_llc_codes_sum_to_one(rng):
    D, X, _ = make_problem(rng, p=16, K=64, N=64, T=3)
    G = np.asarray(llc(D.astype(np.float32), X.astype(np.float32), knn=7))
    np.testing.assert_allclose(G.sum(axis=0), 1.0, atol=1e-5)
    assert ((np.abs(G) > 1e-12).sum(axis=0) <= 7).all()


def test_llc_via_encoder_facade(rng):
    D, X, _ = make_problem(rng, p=16, K=64, N=96, T=3)
    enc = SparseEncoder("llc", {"knn": 5, "lam": 1e-4}, check_atoms=False)
    G = np.asarray(enc.encode(jnp.asarray(X, jnp.float32),
                              jnp.asarray(D, jnp.float32)))
    ref = oracle.llc(D, X, knn=5, lam=1e-4)
    np.testing.assert_allclose(G.astype(np.float64), ref, atol=5e-4)
