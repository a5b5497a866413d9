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
