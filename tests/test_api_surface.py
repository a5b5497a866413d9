"""Smoke the ENTIRE public API surface with tiny shapes.

Motivated by an r3 find: SparseEncoder('lasso'/'lars') raised
AttributeError at call time because no test ever exercised those routes
(a package re-export shadowed the submodule).  This test calls every
documented entry point once — it pins *callability and output sanity*,
not numerics (the per-solver parity suites do that).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import lyssandra_tpu as lt


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(7)
    D = rng.standard_normal((16, 32))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = D[:, rng.integers(0, 32, 48)] * rng.standard_normal(48) \
        + 0.01 * rng.standard_normal((16, 48))
    return (D.astype(np.float32), X.astype(np.float32),
            rng.integers(0, 3, 48))


ENCODER_ROUTES = [
    ("bomp", {"T": 3}),
    ("batch_omp", {"T": 3}),
    ("omp", {"T": 3}),
    ("group_omp", {"T": 2, "groups": np.repeat(np.arange(8), 4)}),
    ("nn_omp", {"T": 3}),
    ("thresholding", {"lam": 0.1}),
    ("soft_thresholding", {"lam": 0.1}),
    ("hard_thresholding", {"lam": 0.1}),
    ("lasso", {"lam": 0.2}),
    ("feature_sign", {"lam": 0.2}),
    ("lars", {"lam": 0.2}),
    ("lasso_lars", {"lam": 0.2}),
    ("fista", {"lam": 0.2}),
    ("llc", {"knn": 4, "lam": 1e-4}),
]


@pytest.mark.parametrize("alg,params",
                         ENCODER_ROUTES, ids=[a for a, _ in ENCODER_ROUTES])
def test_every_encoder_route_runs(tiny, alg, params):
    D, X, _ = tiny
    G = np.asarray(
        lt.SparseEncoder(alg, params, check_atoms=False).encode(X, D)
    )
    assert G.shape == (32, 48)
    assert np.isfinite(G).all()
    assert np.abs(G).sum() > 0


@pytest.mark.parametrize("alg", ["bomp", "omp", "nn_omp"])
def test_encoder_compact_output(tiny, alg):
    # dense=False returns compact GreedyResult; its dense/CSC exports
    # match the dense route exactly (same solver, same codes)
    D, X, _ = tiny
    enc = lt.SparseEncoder(alg, {"T": 3}, check_atoms=False, block=16)
    res = enc.encode(X, D, dense=False)
    assert res.idx.shape == (48, 3) and res.gamma.shape == (48, 3)
    dense = np.asarray(enc.encode(X, D))
    np.testing.assert_allclose(np.asarray(res.dense(32)), dense, atol=1e-6)
    np.testing.assert_allclose(res.to_csc(32).toarray(), dense, atol=1e-6)


def test_encoder_compact_group_omp(tiny):
    # group route: compact slots are T * group_size wide; padded member
    # slots carry zeros and vanish from the CSC export
    D, X, _ = tiny
    groups = np.repeat(np.arange(8), 4)
    enc = lt.SparseEncoder("group_omp", {"T": 2, "groups": groups},
                           check_atoms=False, block=16)
    res = enc.encode(X, D, dense=False)
    assert res.idx.shape == (48, 8)              # T=2 groups x gs=4
    dense = np.asarray(enc.encode(X, D))
    np.testing.assert_allclose(np.asarray(res.dense(32)), dense, atol=1e-6)
    csc = res.to_csc(32)
    np.testing.assert_allclose(csc.toarray(), dense, atol=1e-6)
    assert csc.nnz <= (np.abs(dense) > 0).sum() + 1


def test_encoder_compact_rejects_nongreedy(tiny):
    D, X, _ = tiny
    with pytest.raises(ValueError, match="dense=False"):
        lt.SparseEncoder("fista", {"lam": 0.2}, check_atoms=False).encode(
            X, D, dense=False
        )


def test_encoder_compact_with_mesh(tiny):
    from lyssandra_tpu.parallel import make_mesh

    D, X, _ = tiny
    mesh = make_mesh()
    res = lt.SparseEncoder(
        "bomp", {"T": 3}, check_atoms=False, mesh=mesh
    ).encode(X, D, dense=False)
    ref = lt.SparseEncoder("bomp", {"T": 3}, check_atoms=False).encode(
        X, D, dense=False
    )
    np.testing.assert_allclose(
        np.asarray(res.dense(32)), np.asarray(ref.dense(32)), atol=2e-5
    )


def test_solver_functions_run(tiny):
    D, X, _ = tiny
    for fn, kw in [
        (lt.omp, dict(T=3)), (lt.batch_omp, dict(T=3)),
        (lt.nn_omp, dict(T=3)),
        (lt.feature_sign, dict(lam=0.2)), (lt.lasso, dict(lam=0.2)),
        (lt.lars, dict(lam=0.2)), (lt.lasso_lars, dict(lam=0.2)),
        (lt.fista, dict(lam=0.2)),
        (lt.llc, dict(knn=4)),
        (lt.threshold_code, dict(lam=0.1)),
    ]:
        if fn in (lt.feature_sign, lt.lasso, lt.lars, lt.lasso_lars,
                  lt.fista, lt.threshold_code):
            G = fn(D, X, kw.pop("lam"), **kw)
        else:
            G = fn(D, X, **kw)
        assert np.isfinite(np.asarray(G)).all()
    G = lt.group_omp(D, X, np.repeat(np.arange(8), 4), 2)
    assert np.isfinite(np.asarray(G)).all()


@pytest.mark.slow
def test_pipeline_classes_run(tiny):
    D, X, y = tiny
    k = lt.KSVDLearner(lt.KSVDConfig(K=16, T=2, n_iter=1)).fit(X)
    assert np.isfinite(np.asarray(k.D_)).all()
    o = lt.OnlineDictionaryLearner(
        lt.OnlineDLConfig(K=16, lam=0.15, batch_size=16, chunk_batches=1,
                          fs_max_iter=4)
    ).fit(X)
    assert np.isfinite(np.asarray(o.D_)).all()
    lc = lt.LCKSVD(lt.LCKSVDConfig(K=9, T=2, n_iter=1)).fit(X, y)
    assert lc.predict(X).shape == (48,)
    src = lt.SRCClassifier(T=2).fit(X, y)
    assert src.score(X, y) >= 0.0
    clf = lt.LinearClassifier().fit(X, y)
    assert clf.predict(X).shape == (48,)
    svm = lt.LinearSVM().fit(X, y)
    assert svm.predict(X).shape == (48,)


def test_ops_and_apps_run():
    img = np.random.default_rng(9).standard_normal((24, 24)).astype(np.float32)
    P = lt.extract_patches(jnp.asarray(img), 8)
    Pc, mu = lt.remove_dc(P)
    Pn, sc = lt.contrast_normalize(Pc)
    w = lt.Whitener().fit(Pn)
    back = w.inverse_transform(w.transform(Pn))
    np.testing.assert_allclose(np.asarray(back), np.asarray(Pn), atol=1e-3)
    D = lt.dct_dictionary(8, 64)
    rec = lt.reconstruct_from_patches(P, img.shape, 8)
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-4)
    den = lt.denoise(img, D, sigma=25.0,
                     cfg=lt.DenoiseConfig(sigma=25.0, T_max=4, block=512))
    assert np.isfinite(np.asarray(den)).all()
    fe = lt.FeatureExtractor(D, patch=8, stride=8, levels=(1,))
    F = fe.transform(np.stack([img, img]))
    assert np.isfinite(np.asarray(F)).all()
