"""Oracle self-consistency + cross-library checks (SURVEY.md §4.2, §4.4).

The oracle IS the reference semantics; these tests pin it against sklearn
and against the papers' mathematical properties before anything JAX is
trusted against it.
"""

import numpy as np
import pytest

from lyssandra_tpu import oracle
from tests.conftest import make_problem


def test_patch_roundtrip(rng):
    img = rng.standard_normal((24, 20))
    X = oracle.extract_patches(img, 8, stride=1)
    assert X.shape == (64, (24 - 8 + 1) * (20 - 8 + 1))
    rec = oracle.reconstruct_from_patches(X, img.shape, 8)
    np.testing.assert_allclose(rec, img, atol=1e-12)


def test_patch_roundtrip_strided(rng):
    img = rng.standard_normal((26, 26))
    X = oracle.extract_patches(img, 6, stride=4)
    rec = oracle.reconstruct_from_patches(X, img.shape, 6, stride=4)
    # strided coverage still covers every pixel here? only where counted
    n = 0
    for i in range(0, 21, 4):
        for j in range(0, 21, 4):
            np.testing.assert_allclose(
                X[:, n], img[i : i + 6, j : j + 6].ravel()
            )
            n += 1


def test_dc_and_contrast(rng):
    X = rng.standard_normal((64, 100))
    Xc, mu = oracle.remove_dc(X)
    np.testing.assert_allclose(Xc.mean(axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(Xc + mu[None, :], X)
    Xn, s = oracle.contrast_normalize(Xc)
    np.testing.assert_allclose(np.linalg.norm(Xn, axis=0), 1.0, atol=1e-9)
    np.testing.assert_allclose(Xn * s[None, :], Xc)


def test_zca_roundtrip(rng):
    X = rng.standard_normal((16, 500))
    w = oracle.ZCAWhitener(eps=1e-5).fit(X)
    Xw = w.transform(X)
    C = Xw @ Xw.T / Xw.shape[1]
    np.testing.assert_allclose(C, np.eye(16), atol=1e-3)
    np.testing.assert_allclose(w.inverse_transform(Xw), X, atol=1e-8)


def test_dct_dictionary():
    D = oracle.dct_dictionary(8, 256)
    assert D.shape == (64, 256)
    np.testing.assert_allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-12)
    # first atom is the (normalized) DC atom
    np.testing.assert_allclose(D[:, 0], np.full(64, 1 / 8.0), atol=1e-12)


def test_omp_properties(rng):
    D, X, _ = make_problem(rng)
    T = 4
    Gamma = oracle.omp(D, X, T)
    assert ((Gamma != 0).sum(axis=0) <= T).all()
    # residual monotone decreasing in T
    prev = np.full(X.shape[1], np.inf)
    for t in range(1, T + 1):
        G = oracle.omp(D, X, t)
        r = np.linalg.norm(X - D @ G, axis=0)
        assert (r <= prev + 1e-10).all()
        prev = r


def test_batch_omp_equals_omp(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=40, T=5)
    G1 = oracle.omp(D, X, 5)
    G2 = oracle.batch_omp(D, X, 5)
    np.testing.assert_allclose(G1, G2, atol=1e-8)


def test_batch_omp_vs_sklearn(rng):
    from sklearn.linear_model import orthogonal_mp_gram

    D, X, _ = make_problem(rng, p=16, K=48, N=40, T=5)
    G2 = oracle.batch_omp(D, X, 5)
    Gs = orthogonal_mp_gram(D.T @ D, D.T @ X, n_nonzero_coefs=5)
    np.testing.assert_allclose(G2, Gs, atol=1e-7)


def test_batch_omp_eps_mode(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=40, T=5)
    eps = 0.5 * np.median(np.linalg.norm(X, axis=0))
    G = oracle.batch_omp(D, X, 16, eps=eps)
    r = np.linalg.norm(X - D @ G, axis=0)
    # every signal either reached eps or used all 16 atoms
    used = (G != 0).sum(axis=0)
    assert ((r <= eps * (1 + 1e-6)) | (used >= 16)).all()
    # no over-coding: removing the last atom must break the eps bound is hard
    # to check per-signal cheaply; instead check codes are not maximal for all
    assert used.mean() < 16


def test_group_omp(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=20, T=4)
    groups = np.repeat(np.arange(12), 4)  # 12 groups of 4 atoms
    G = oracle.group_omp(D, X, groups, T=2)
    # at most 2 groups * 4 atoms nonzero
    assert ((G != 0).sum(axis=0) <= 8).all()
    for n in range(X.shape[1]):
        used_groups = np.unique(groups[np.abs(G[:, n]) > 0])
        assert len(used_groups) <= 2


def test_nn_omp(rng):
    D, X, _ = make_problem(rng, p=16, K=48, N=10, T=4)
    G = oracle.nn_omp(D, np.abs(X), 4)
    assert (G >= 0).all()
    assert ((G != 0).sum(axis=0) <= 4).all()


def test_threshold_code(rng):
    D, X, _ = make_problem(rng)
    Gs = oracle.threshold_code(D, X, 0.3, "soft")
    A = D.T @ X
    np.testing.assert_allclose(
        Gs, np.sign(A) * np.maximum(np.abs(A) - 0.3, 0)
    )


def test_feature_sign_kkt(rng):
    D, X, _ = make_problem(rng, p=16, K=32, N=6, T=3)
    lam = 0.2
    for n in range(X.shape[1]):
        g = oracle.feature_sign(D, X[:, n], lam)
        gr = 2 * (D.T @ (D @ g - X[:, n]))
        act = np.abs(g) > 1e-10
        # KKT: active coords satisfy grad + lam*sign = 0; inactive |grad|<=lam
        np.testing.assert_allclose(
            gr[act] + lam * np.sign(g[act]), 0, atol=1e-6
        )
        assert (np.abs(gr[~act]) <= lam + 1e-6).all()


def test_feature_sign_vs_sklearn(rng):
    from sklearn.linear_model import Lasso

    D, X, _ = make_problem(rng, p=16, K=32, N=6, T=3)
    lam = 0.2
    for n in range(X.shape[1]):
        g = oracle.feature_sign(D, X[:, n], lam)
        # sklearn Lasso: (1/(2 n_samples)) ||y-Xw||^2 + alpha ||w||_1
        # ours: ||y-Xw||^2 + lam ||w||_1  => alpha = lam / (2 * p)
        sk = Lasso(alpha=lam / (2 * D.shape[0]), fit_intercept=False,
                   max_iter=50000, tol=1e-12).fit(D, X[:, n])
        obj = lambda w: np.sum((X[:, n] - D @ w) ** 2) + lam * np.abs(w).sum()
        assert obj(g) <= obj(sk.coef_) + 1e-6


def test_ksvd_objective_decreases(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=200, T=3)
    Dk = oracle.init_dictionary(X, 24, "data", seed=1)
    first = last = None
    for _ in range(4):
        Gamma = oracle.batch_omp(Dk, X, 3)
        err_before = np.linalg.norm(X - Dk @ Gamma) ** 2
        if first is None:
            first = err_before
        # the atom-update stage is the monotone one (coding is greedy OMP,
        # which carries no monotonicity guarantee vs the post-SVD codes)
        Dk, Gamma = oracle.ksvd_atom_update(X, Dk, Gamma, exact=True)
        err_after = np.linalg.norm(X - Dk @ Gamma) ** 2
        assert err_after <= err_before + 1e-8
        last = err_after
    assert last < first
    np.testing.assert_allclose(np.linalg.norm(Dk, axis=0), 1.0, atol=1e-8)


def test_online_dl_objective(rng):
    D, X, _ = make_problem(rng, p=16, K=24, N=400, T=3)
    Dk = oracle.init_dictionary(X, 24, "data", seed=2)
    A = np.zeros((24, 24))
    B = np.zeros((16, 24))
    lam = 0.15
    objs = []
    for i in range(4):
        Xb = X[:, i * 100 : (i + 1) * 100]
        Dk, A, B = oracle.online_dl_step(Dk, A, B, Xb, lam)
        G = oracle.lasso(Dk, X[:, :100], lam)
        objs.append(
            np.sum((X[:, :100] - Dk @ G) ** 2) + lam * np.abs(G).sum()
        )
    assert objs[-1] <= objs[0]
    assert (np.linalg.norm(Dk, axis=0) <= 1.0 + 1e-9).all()


def test_src_classifier(rng):
    # two well-separated classes; training samples as the dictionary
    c0 = rng.standard_normal(16)
    c1 = rng.standard_normal(16)
    Xtr = np.stack(
        [c0 + 0.1 * rng.standard_normal(16) for _ in range(10)]
        + [c1 + 0.1 * rng.standard_normal(16) for _ in range(10)],
        axis=1,
    )
    Xtr /= np.linalg.norm(Xtr, axis=0, keepdims=True)
    y = np.array([0] * 10 + [1] * 10)
    Xte = np.stack(
        [c0 + 0.1 * rng.standard_normal(16) for _ in range(5)]
        + [c1 + 0.1 * rng.standard_normal(16) for _ in range(5)],
        axis=1,
    )
    Xte /= np.linalg.norm(Xte, axis=0, keepdims=True)
    pred = oracle.src_predict(Xtr, y, Xte, T=5)
    assert (pred == np.array([0] * 5 + [1] * 5)).all()


def test_lc_ksvd_stack_shapes(rng):
    p, K, C, N = 16, 24, 3, 60
    X = rng.standard_normal((p, N))
    y = rng.integers(0, C, N)
    Q = oracle.build_label_consistency(y, K, C)
    H = oracle.one_hot(y, C)
    D0 = oracle.init_dictionary(X, K, "data")
    G0 = oracle.batch_omp(D0, X, 4)
    A0 = oracle.ridge(G0, Q)
    W0 = oracle.ridge(G0, H)
    assert A0.shape == (K, K) and W0.shape == (C, K)
    Xt, Dt = oracle.lc_ksvd_stack(X, y, D0, A0, W0, Q, H, 4.0, 2.0)
    assert Xt.shape == (p + K + C, N)
    np.testing.assert_allclose(np.linalg.norm(Dt, axis=0), 1.0, atol=1e-9)
    D, A, W = oracle.lc_ksvd_unstack(Dt, p, K, C, 4.0, 2.0)
    np.testing.assert_allclose(np.linalg.norm(D, axis=0), 1.0, atol=1e-9)


def test_denoise_improves_psnr(rng):
    # tiny smooth image + DCT dictionary: denoising should beat the noisy PSNR
    x = np.linspace(0, 2 * np.pi, 48)
    img = 100 + 60 * np.outer(np.sin(x), np.cos(x))
    noisy = img + 15.0 * rng.standard_normal(img.shape)
    D = oracle.dct_dictionary(8, 64)
    den = oracle.denoise(noisy, D, sigma=15.0)
    assert oracle.psnr(den, img) > oracle.psnr(noisy, img) + 2.0
