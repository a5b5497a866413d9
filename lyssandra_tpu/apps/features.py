"""Feature-extraction pipeline: encode -> spatial pooling -> classify.

SURVEY.md §2.1 / §3.5: the reference's computer-vision feature toolkit —
dense patches per image, preprocess, sparse-encode over a (learned)
dictionary, spatial-pyramid max pooling of the absolute codes, then a
linear classifier on the pooled features (Yang et al. 2009 ScSPM shape).

Everything is batched: an image's patch grid is encoded in one solver call
and pooled with reshapes + max reductions (no per-cell Python loops).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lyssandra_tpu.ops.patches import (
    contrast_normalize,
    extract_patches,
    n_patches,
    remove_dc,
)
from lyssandra_tpu.solvers.encoder import SparseEncoder


def spatial_pyramid_pool(
    codes: jax.Array, grid: tuple[int, int], levels=(1, 2, 4)
) -> jax.Array:
    """Max-pool |codes| over a spatial pyramid.

    codes: (K, N) codes of patches laid out row-major on a grid (Hp, Wp).
    Returns a feature vector of length K * sum(l*l for l in levels).
    """
    K = codes.shape[0]
    Hp, Wp = grid
    A = jnp.abs(codes).reshape(K, Hp, Wp)
    feats = []
    for l in levels:
        # pad so the grid divides evenly into l x l cells
        ph = (-Hp) % l
        pw = (-Wp) % l
        Ap = jnp.pad(A, ((0, 0), (0, ph), (0, pw)))
        ch = (Hp + ph) // l
        cw = (Wp + pw) // l
        cells = Ap.reshape(K, l, ch, l, cw)
        feats.append(cells.max(axis=(2, 4)).reshape(K * l * l))
    return jnp.concatenate(feats)


class FeatureExtractor:
    """Encode images into pooled sparse-code features.

    encoder: any SparseEncoder (default Batch-OMP T=10).
    preprocess: 'dc' removes patch means; 'dc+norm' also contrast-
    normalizes; 'dc+norm+whiten' additionally applies a fitted ``whitener``
    (ops.whitening.Whitener) — the full north-star preprocessing stack.
    """

    def __init__(
        self, D, *, patch: int = 8, stride: int = 4,
        encoder: SparseEncoder | None = None,
        levels=(1, 2, 4), preprocess: str = "dc", whitener=None,
        img_block: int = 64,
    ):
        self.D = jnp.asarray(D, jnp.float32)
        self.patch = patch
        self.stride = stride
        self.encoder = encoder or SparseEncoder(
            "bomp", {"T": 10}, check_atoms=False
        )
        self.levels = levels
        self.preprocess = preprocess
        self.whitener = whitener
        self.img_block = img_block
        if preprocess.endswith("+whiten") and whitener is None:
            raise ValueError("preprocess includes 'whiten': pass whitener=")

    def _preprocess(self, X):
        X, _ = remove_dc(X)
        if "norm" in self.preprocess:
            X, _ = contrast_normalize(X)
        if self.preprocess.endswith("+whiten"):
            X = self.whitener.transform(X)
        return X

    def transform_image(self, img) -> jax.Array:
        img = jnp.asarray(img, jnp.float32)
        X = self._preprocess(extract_patches(img, self.patch, self.stride))
        codes = self.encoder.encode(X, self.D)
        grid = n_patches(img.shape[0], img.shape[1], self.patch, self.stride)
        return spatial_pyramid_pool(codes, grid, self.levels)

    def transform(self, imgs) -> jax.Array:
        """imgs: (B, H, W) array or iterable of same-shape (H, W) arrays
        -> (B, F) features.

        Batched TPU-native path: one solver launch codes every patch of an
        ``img_block``-image chunk (img_block * Np lanes), then pooling is a
        reshaped max-reduction per image.  Chunking over images bounds the
        materialized patch matrix at (p^2, img_block * Np) so dataset-scale
        transforms cannot exhaust HBM; every full chunk reuses one compiled
        executable."""
        imgs = jnp.asarray(imgs, jnp.float32)
        if imgs.ndim == 2:
            imgs = imgs[None]
        B = imgs.shape[0]
        if B <= self.img_block:
            return self._transform_block(imgs)
        # pad the trailing partial block to img_block with zero images
        # (r4, profile_features): every distinct block shape compiles a
        # fresh executable on the remote helper (30-120 s) — a 240-image
        # transform at img_block=64 used to compile THREE shapes
        # (64, 48, and the warm-up's).  Zero images are inert: zero
        # patches stay zero through DC/contrast/whitening (linear /
        # guarded by eps) and code to zero; their pooled rows are
        # sliced off below.
        pad = (-B) % self.img_block
        if pad:
            imgs = jnp.concatenate(
                [imgs, jnp.zeros((pad,) + imgs.shape[1:], imgs.dtype)],
                axis=0,
            )
        feats = [
            self._transform_block(imgs[b : b + self.img_block])
            for b in range(0, B + pad, self.img_block)
        ]
        return jnp.concatenate(feats, axis=0)[:B]

    def _transform_block(self, imgs) -> jax.Array:
        B, H, W = imgs.shape
        p, s = self.patch, self.stride
        Xb = jax.vmap(lambda im: extract_patches(im, p, s))(imgs)
        Np = Xb.shape[-1]
        X = self._preprocess(
            jnp.moveaxis(Xb, 0, 1).reshape(p * p, B * Np)
        )
        codes = self.encoder.encode(X, self.D)      # (K, B*Np)
        K = codes.shape[0]
        per_img = jnp.moveaxis(codes.reshape(K, B, Np), 1, 0)
        grid = n_patches(H, W, p, s)
        return jax.vmap(
            lambda c: spatial_pyramid_pool(c, grid, self.levels)
        )(per_img)
