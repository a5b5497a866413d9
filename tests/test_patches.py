"""JAX patch pipeline vs NumPy oracle (SURVEY.md §4.3)."""

import numpy as np

from lyssandra_tpu import oracle
from lyssandra_tpu.ops import (
    contrast_normalize,
    dct_dictionary,
    extract_patches,
    init_dictionary,
    mutual_coherence,
    normalize_atoms,
    reconstruct_from_patches,
    remove_dc,
    weighted_reconstruct,
)


def test_extract_matches_oracle(rng):
    img = rng.standard_normal((24, 20))
    ref = oracle.extract_patches(img, 8)
    out = np.asarray(extract_patches(img, 8))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_extract_strided(rng):
    img = rng.standard_normal((26, 30))
    ref = oracle.extract_patches(img, 6, stride=3)
    out = np.asarray(extract_patches(img, 6, 3))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fold_roundtrip(rng):
    img = rng.standard_normal((24, 20)).astype(np.float32)
    X = extract_patches(img, 8)
    rec = np.asarray(reconstruct_from_patches(X, img.shape, 8))
    np.testing.assert_allclose(rec, img, atol=1e-5)


def test_fold_matches_oracle(rng):
    X = rng.standard_normal((36, 15 * 19)).astype(np.float32)
    ref = oracle.reconstruct_from_patches(X.astype(np.float64), (20, 24), 6)
    out = np.asarray(reconstruct_from_patches(X, (20, 24), 6))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_weighted_reconstruct_matches_oracle(rng):
    y = rng.standard_normal((20, 24))
    X = rng.standard_normal((36, 15 * 19))
    lam = 0.7
    ref = oracle.reconstruct_from_patches(X, (20, 24), 6, y=y, lam=lam)
    out = np.asarray(
        weighted_reconstruct(X.astype(np.float32), y.astype(np.float32), 6, lam)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_extract_color_matches_oracle(rng):
    img = rng.standard_normal((24, 20, 3))
    ref = oracle.extract_patches(img, 8)
    out = np.asarray(extract_patches(img, 8))
    assert out.shape == (3 * 64, 17 * 13)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fold_color_roundtrip_and_oracle(rng):
    img = rng.standard_normal((24, 20, 3)).astype(np.float32)
    X = extract_patches(img, 8)
    rec = np.asarray(reconstruct_from_patches(X, img.shape, 8))
    np.testing.assert_allclose(rec, img, atol=1e-5)
    ref = oracle.reconstruct_from_patches(
        np.asarray(X, np.float64), img.shape, 8
    )
    np.testing.assert_allclose(rec, ref, atol=1e-5)


def test_weighted_reconstruct_color_matches_oracle(rng):
    y = rng.standard_normal((20, 24, 3))
    X = rng.standard_normal((3 * 36, 15 * 19))
    lam = 0.7
    ref = oracle.reconstruct_from_patches(X, y.shape, 6, y=y, lam=lam)
    out = np.asarray(weighted_reconstruct(
        X.astype(np.float32), y.astype(np.float32), 6, lam
    ))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_dc_contrast_match_oracle(rng):
    X = rng.standard_normal((64, 200))
    rc, rmu = oracle.remove_dc(X)
    jc, jmu = remove_dc(X.astype(np.float32))
    np.testing.assert_allclose(np.asarray(jc), rc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jmu), rmu, atol=1e-5)
    rn, rs = oracle.contrast_normalize(rc)
    jn, js = contrast_normalize(jc)
    np.testing.assert_allclose(np.asarray(jn), rn, atol=1e-5)
    np.testing.assert_allclose(np.asarray(js), rs, atol=1e-4)


def test_dct_dictionary_matches_oracle():
    ref = oracle.dct_dictionary(8, 256)
    out = np.asarray(dct_dictionary(8, 256))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_init_dictionary(rng):
    X = rng.standard_normal((64, 500)).astype(np.float32)
    for method in ("random", "data", "dct"):
        D = np.asarray(init_dictionary(X, 256, method))
        assert D.shape == (64, 256)
        np.testing.assert_allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-5)


def test_normalize_and_coherence(rng):
    D = rng.standard_normal((16, 32)).astype(np.float32)
    Dn = np.asarray(normalize_atoms(D))
    np.testing.assert_allclose(np.linalg.norm(Dn, axis=0), 1.0, atol=1e-6)
    mu = float(mutual_coherence(Dn))
    G = np.abs(Dn.T @ Dn)
    np.fill_diagonal(G, 0)
    np.testing.assert_allclose(mu, G.max(), atol=1e-6)


def test_whitener_matches_oracle(rng):
    from lyssandra_tpu.config import WhitenConfig
    from lyssandra_tpu.ops.whitening import Whitener
    from lyssandra_tpu import oracle

    X = rng.standard_normal((16, 500))
    ref = oracle.ZCAWhitener(eps=1e-2).fit(X)
    w = Whitener(WhitenConfig(eps=1e-2)).fit(X.astype(np.float32))
    Xw = np.asarray(w.transform(X.astype(np.float32)))
    np.testing.assert_allclose(Xw, ref.transform(X), atol=2e-3)
    back = np.asarray(w.inverse_transform(Xw))
    np.testing.assert_allclose(back, X, atol=2e-3)


def test_whitener_pca_mode(rng):
    from lyssandra_tpu.config import WhitenConfig
    from lyssandra_tpu.ops.whitening import Whitener

    X = rng.standard_normal((16, 400)).astype(np.float32)
    w = Whitener(WhitenConfig(eps=1e-5, pca_dim=8)).fit(X)
    Xw = np.asarray(w.transform(X))
    assert Xw.shape == (8, 400)
    C = Xw @ Xw.T / 400
    np.testing.assert_allclose(C, np.eye(8), atol=5e-2)
