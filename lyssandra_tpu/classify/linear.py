"""Linear classification on sparse codes (SURVEY.md §2.1 'Linear classifier
on codes'): ridge regression to one-hot targets, argmax prediction.

Pure JAX (the reference delegates to sklearn; sklearn stays test-only here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def one_hot(y, C: int) -> jax.Array:
    """(C, N) one-hot label matrix (oracle.one_hot layout)."""
    return jax.nn.one_hot(jnp.asarray(y, jnp.int32), C, dtype=jnp.float32).T


def ridge(Z: jax.Array, Y: jax.Array, lam: float = 1.0) -> jax.Array:
    """W = Y Z^T (Z Z^T + lam I)^{-1} (oracle.ridge): codes Z (K, N) ->
    targets Y (C, N)."""
    Z = jnp.asarray(Z, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    K = Z.shape[0]
    Gram = jnp.matmul(Z, Z.T, precision=_HI) + lam * jnp.eye(K)
    return jnp.linalg.solve(Gram, jnp.matmul(Z, Y.T, precision=_HI)).T


class LinearSVM:
    """Multiclass linear SVM on (sparse) code vectors — the recognition
    pipeline's classifier (SURVEY.md §3.5 'linear SVM'; the reference
    delegates to sklearn, which stays test-only here).

    One-vs-rest squared-hinge objective, minimized by full-batch Nesterov
    gradient descent inside one ``lax.scan`` — every class in parallel as
    rows of W, every sample as a lane; no per-class or per-sample Python.
    """

    def __init__(self, C: float = 1.0, n_iter: int = 300,
                 lr: float | None = None, fit_intercept: bool = True):
        self.C = C
        self.n_iter = n_iter
        self.lr = lr
        self.fit_intercept = fit_intercept

    def fit(self, Z, y) -> "LinearSVM":
        Z = jnp.asarray(Z, jnp.float32)              # (F, N)
        y = jnp.asarray(y, jnp.int32)
        if self.fit_intercept:
            Z = jnp.concatenate(
                [Z, jnp.ones((1, Z.shape[1]), Z.dtype)], axis=0
            )
        F, N = Z.shape
        C_cls = int(y.max()) + 1
        self.classes_ = C_cls
        Ypm = 2.0 * one_hot(y, C_cls) - 1.0          # (C, N) in {-1, +1}
        lam = 1.0 / (self.C * N)
        # gradient Lipschitz bound for lr: squared hinge curvature is
        # 2/N ||Z||^2 + lam
        znorm = jnp.linalg.norm(Z, ord="fro") ** 2
        lr = self.lr if self.lr is not None else 1.0 / (
            2.0 * float(znorm) / N + lam
        )

        def grad(W):
            M = jnp.maximum(
                0.0, 1.0 - Ypm * jnp.matmul(W, Z, precision=_HI)
            )                                        # (C, N) margins
            G = -2.0 / N * jnp.matmul(Ypm * M, Z.T, precision=_HI)
            return G + lam * W

        def step(carry, _):
            W, V, t = carry
            Wn = V - lr * grad(V)
            tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            Vn = Wn + ((t - 1.0) / tn) * (Wn - W)
            return (Wn, Vn, tn), None

        W0 = jnp.zeros((C_cls, F), jnp.float32)
        (W, _, _), _ = lax.scan(
            step, (W0, W0, jnp.ones(())), None, length=self.n_iter
        )
        self.W_ = W
        return self

    def decision_function(self, Z) -> jax.Array:
        Z = jnp.asarray(Z, jnp.float32)
        if self.fit_intercept:
            Z = jnp.concatenate(
                [Z, jnp.ones((1, Z.shape[1]), Z.dtype)], axis=0
            )
        return jnp.matmul(self.W_, Z, precision=_HI)

    def predict(self, Z) -> jax.Array:
        return jnp.argmax(self.decision_function(Z), axis=0)

    def score(self, Z, y) -> float:
        return float((self.predict(Z) == jnp.asarray(y)).mean())


class LinearClassifier:
    """Ridge-to-one-hot linear classifier on (sparse) code vectors."""

    def __init__(self, lam: float = 1.0):
        self.lam = lam

    def fit(self, Z, y) -> "LinearClassifier":
        y = jnp.asarray(y, jnp.int32)
        self.classes_ = int(y.max()) + 1
        H = one_hot(y, self.classes_)
        self.W_ = ridge(Z, H, self.lam)
        return self

    def decision_function(self, Z) -> jax.Array:
        return jnp.matmul(self.W_, jnp.asarray(Z, jnp.float32), precision=_HI)

    def predict(self, Z) -> jax.Array:
        return jnp.argmax(self.decision_function(Z), axis=0)

    def score(self, Z, y) -> float:
        return float((self.predict(Z) == jnp.asarray(y)).mean())
