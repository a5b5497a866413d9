"""Sparse-representation classification (Wright et al. 2009; BASELINE
config 5).  Dictionary = training samples grouped by class; a test sample is
sparse-coded and assigned to the class with smallest class-restricted
residual ||x - D delta_c(gamma)||_2.

Batched: all test samples are coded in one solver call, and all C class
residuals are evaluated with one masked reconstruction einsum each —
no per-sample or per-class Python in the hot path beyond the class loop
over C masked GEMMs (oracle.src_predict parity).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.solvers.encoder import SparseEncoder

_HI = lax.Precision.HIGHEST


class SRCClassifier:
    """fit(X, y) stores normalized training samples as the dictionary;
    predict(X) codes with OMP (or any encoder) and picks the class of the
    minimal residual."""

    def __init__(self, T: int = 10, *, encoder: SparseEncoder | None = None,
                 normalize: bool = True):
        self.T = T
        self.encoder = encoder or SparseEncoder(
            "omp", {"T": T}, check_atoms=False
        )
        self.normalize = normalize

    def fit(self, X, y) -> "SRCClassifier":
        X = jnp.asarray(X, jnp.float32)
        if self.normalize:
            X = X / jnp.maximum(jnp.linalg.norm(X, axis=0, keepdims=True),
                                1e-12)
        self.D_ = X
        self.y_ = np.asarray(y)
        self.classes_ = np.unique(self.y_)
        # (C, K) class-membership masks over dictionary columns
        self.masks_ = jnp.asarray(
            np.stack([(self.y_ == c) for c in self.classes_]).astype(
                np.float32
            )
        )
        return self

    def residuals(self, X) -> jax.Array:
        """(C, N) squared class-restricted residual norms."""
        X = jnp.asarray(X, jnp.float32)
        if self.normalize:
            X = X / jnp.maximum(jnp.linalg.norm(X, axis=0, keepdims=True),
                                1e-12)
        Gamma = self.encoder.encode(X, self.D_)          # (K, N)
        res = []
        for c in range(self.masks_.shape[0]):
            Gc = Gamma * self.masks_[c][:, None]
            R = X - jnp.matmul(self.D_, Gc, precision=_HI)
            res.append(jnp.sum(R * R, axis=0))
        return jnp.stack(res)

    def predict(self, X):
        r = self.residuals(X)
        return self.classes_[np.asarray(jnp.argmin(r, axis=0))]

    def score(self, X, y) -> float:
        return float((self.predict(X) == np.asarray(y)).mean())
