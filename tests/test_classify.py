"""LC-KSVD / SRC / linear classifier (BASELINE config 5, SURVEY.md §4.5)."""

import numpy as np
import pytest

from lyssandra_tpu import oracle
from lyssandra_tpu.classify import LCKSVD, LinearClassifier, SRCClassifier
from lyssandra_tpu.classify.lc_ksvd import build_label_consistency
from lyssandra_tpu.classify.linear import one_hot, ridge
from lyssandra_tpu.config import LCKSVDConfig
import jax.numpy as jnp


def _digits_like(rng, C=4, per=30, p=32, noise=0.25, protos=None):
    """Toy 'digit' set: C class prototypes + noise, unit-normalized.
    Pass `protos` to sample train and test sets from the SAME classes."""
    if protos is None:
        protos = rng.standard_normal((p, C))
    Xs, ys = [], []
    for c in range(C):
        Z = protos[:, [c]] + noise * rng.standard_normal((p, per))
        Xs.append(Z)
        ys.append(np.full(per, c))
    X = np.concatenate(Xs, axis=1)
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    return X.astype(np.float32), np.concatenate(ys), protos


def test_ridge_matches_oracle(rng):
    Z = rng.standard_normal((16, 40))
    Y = rng.standard_normal((3, 40))
    ref = oracle.ridge(Z, Y, 1.0)
    out = np.asarray(ridge(Z.astype(np.float32), Y.astype(np.float32), 1.0))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_one_hot_and_Q(rng):
    y = np.array([0, 1, 2, 1])
    H = np.asarray(one_hot(y, 3))
    np.testing.assert_array_equal(H, oracle.one_hot(y, 3))
    Q = np.asarray(build_label_consistency(y, 10, 3))
    np.testing.assert_array_equal(Q, oracle.build_label_consistency(y, 10, 3))


def test_linear_classifier(rng):
    X, y, _ = _digits_like(rng)
    clf = LinearClassifier(lam=0.1).fit(X, y)
    assert clf.score(X, y) > 0.95


def test_src_classifier(rng):
    Xtr, ytr, protos = _digits_like(rng, per=20)
    Xte, yte, _ = _digits_like(rng, per=10, protos=protos)
    clf = SRCClassifier(T=5).fit(Xtr, ytr)
    assert clf.score(Xte, yte) > 0.9
    r = np.asarray(clf.residuals(Xte))
    assert r.shape == (4, Xte.shape[1])


def test_src_matches_oracle(rng):
    Xtr, ytr, protos = _digits_like(rng, C=3, per=12, p=24)
    Xte, _, _ = _digits_like(rng, C=3, per=4, p=24, protos=protos)
    ref = oracle.src_predict(
        np.asarray(Xtr, np.float64), ytr, np.asarray(Xte, np.float64), T=5
    )
    out = SRCClassifier(T=5, normalize=False).fit(Xtr, ytr).predict(Xte)
    assert (ref == out).mean() > 0.9  # fp32 vs fp64 tie-breaks may differ


@pytest.mark.slow
def test_lc_ksvd_end_to_end(rng):
    Xtr, ytr, protos = _digits_like(rng, C=3, per=40, p=32)
    Xte, yte, _ = _digits_like(rng, C=3, per=15, p=32, protos=protos)
    cfg = LCKSVDConfig(K=24, T=4, n_iter=4)
    clf = LCKSVD(cfg).fit(Xtr, ytr)
    assert clf.D_.shape == (32, 24)
    assert clf.A_.shape == (24, 24)
    assert clf.W_.shape == (3, 24)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(clf.D_), axis=0), 1.0, atol=1e-3
    )
    assert clf.score(Xtr, ytr) > 0.9
    assert clf.score(Xte, yte) > 0.8


def test_linear_svm_separable(rng):
    # two separable clouds; the SVM must classify perfectly and agree
    # with sklearn's LinearSVC (test-only cross-check, SURVEY.md §4.2)
    from sklearn.svm import LinearSVC

    from lyssandra_tpu.classify import LinearSVM

    n = 200
    Z = np.concatenate([
        rng.standard_normal((8, n)) + 3.0,
        rng.standard_normal((8, n)) - 3.0,
        rng.standard_normal((8, n)) * 1.0 + np.array(
            [3, -3, 3, -3, 3, -3, 3, -3])[:, None],
    ], axis=1).astype(np.float32)
    y = np.repeat([0, 1, 2], n)
    svm = LinearSVM(C=1.0, n_iter=400).fit(Z, y)
    assert svm.score(Z, y) >= 0.99
    sk = LinearSVC(C=1.0).fit(Z.T, y)
    assert abs(svm.score(Z, y) - sk.score(Z.T, y)) <= 0.02


def test_linear_svm_on_digit_codes(rng):
    # end-to-end: sparse codes -> SVM, must beat ridge-on-codes baseline
    # class boundary quality on a real (bundled) dataset
    from sklearn.datasets import load_digits

    from lyssandra_tpu.classify import LinearSVM
    from lyssandra_tpu.ops.dictionaries import init_dictionary
    from lyssandra_tpu.solvers import batch_omp

    d = load_digits()
    X = d.data.T.astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-9)
    y = d.target
    D = init_dictionary(jnp.asarray(X), 256, "data", 0)
    Z = np.asarray(batch_omp(D, X, 8))
    ntr = 1200
    svm = LinearSVM(C=10.0, n_iter=400).fit(Z[:, :ntr], y[:ntr])
    acc = svm.score(Z[:, ntr:], y[ntr:])
    assert acc >= 0.9, acc
