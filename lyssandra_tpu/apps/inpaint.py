"""Sparse-representation image inpainting: masked-OMP patch coding +
overlap-add of the full reconstructions (the Elad-school companion of the
denoising pipeline — code each patch over its OBSERVED pixels, predict the
missing ones from the sparse model; oracle.masked_omp is the per-patch
fp64 reference).

Fully batched: all overlapping patches and their per-patch masks in one
masked-OMP launch; the overlap-add uses the same static-pad fold as the
denoiser (no scatters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lyssandra_tpu.ops.patches import extract_patches, fold_patches
from lyssandra_tpu.solvers.greedy import masked_omp


def inpaint(
    img, mask, D, *, T: int = 8, eps: float | None = None,
    patch: int = 8, keep_known: bool = True,
) -> jax.Array:
    """Fill the unobserved pixels (mask == 0) of img.

    img:  (H, W) with arbitrary values at the missing pixels.
    mask: (H, W) 1 = observed, 0 = missing.
    D:    (p^2, K) unit-norm dictionary over p x p patches.
    """
    img = jnp.asarray(img, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    p = patch
    X = extract_patches(img * mask, p)              # (p^2, N)
    Mp = extract_patches(mask, p)                   # per-patch masks
    # DC over the observed pixels only
    cnt = jnp.maximum(Mp.sum(axis=0), 1.0)
    mean = (X * Mp).sum(axis=0) / cnt
    Xc = (X - mean[None, :]) * Mp

    Gamma = masked_omp(D, Xc, Mp, T, eps)
    Xhat = D @ Gamma + mean[None, :]                # full-patch prediction

    acc, n = fold_patches(Xhat, img.shape, p)
    out = acc / jnp.maximum(n, 1.0)
    if keep_known:
        out = jnp.where(mask > 0, img, out)
    return out
