"""PCA / ZCA whitening (oracle.ZCAWhitener parity).

fit: eigendecomposition of the patch covariance on device (jnp.linalg.eigh
— XLA's batched symmetric eigensolver); transform/inverse are single
matmuls.  ZCA: W = V (Lam + eps I)^{-1/2} V^T;  PCA-whitening truncates to
``pca_dim`` leading components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.config import WhitenConfig

_HI = lax.Precision.HIGHEST


class Whitener:
    """fit(X) -> self; transform / inverse_transform on (p, N) columns."""

    def __init__(self, cfg: WhitenConfig = WhitenConfig()):
        self.cfg = cfg

    def fit(self, X) -> "Whitener":
        X = jnp.asarray(X, jnp.float32)
        self.mean_ = X.mean(axis=1, keepdims=True)
        Xc = X - self.mean_
        C = jnp.matmul(Xc, Xc.T, precision=_HI) / X.shape[1]
        lam, V = jnp.linalg.eigh(C)          # ascending
        lam = lam[::-1]
        V = V[:, ::-1]
        if self.cfg.pca_dim is not None:
            lam = lam[: self.cfg.pca_dim]
            V = V[:, : self.cfg.pca_dim]
        d = 1.0 / jnp.sqrt(lam + self.cfg.eps)
        if self.cfg.pca_dim is None:
            self.W_ = (V * d[None, :]) @ V.T           # ZCA
            self.Winv_ = (V / d[None, :]) @ V.T
        else:
            self.W_ = (V * d[None, :]).T               # PCA-whiten
            self.Winv_ = V / d[None, :]
        return self

    def transform(self, X) -> jax.Array:
        X = jnp.asarray(X, jnp.float32)
        return jnp.matmul(self.W_, X - self.mean_, precision=_HI)

    def inverse_transform(self, Xw) -> jax.Array:
        Xw = jnp.asarray(Xw, jnp.float32)
        return jnp.matmul(self.Winv_, Xw, precision=_HI) + self.mean_

    def fused_params(self) -> tuple[jax.Array, jax.Array]:
        """(W, W @ mean) for the fused patch-pipeline epilogue
        (ops.pallas_patches.fused_patch_pipeline ``whiten=``): the kernel
        computes W x - (W m) = transform(x) on the MXU in the same VMEM
        pass as extraction/DC/normalization (BASELINE north star)."""
        return self.W_, jnp.matmul(
            self.W_, self.mean_, precision=_HI
        ).reshape(-1)


ZCAWhitener = Whitener  # reference-style alias
