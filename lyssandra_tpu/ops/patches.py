"""Patch pipeline ops: unfold / fold / DC removal / contrast normalization.

TPU-native design (SURVEY.md §7 step 2): extraction lowers to
``lax.conv_general_dilated_patches`` (an im2col the TPU does as strided
copies); fold is a static sum of ``lax.pad`` placements (one per in-patch
offset) so XLA fuses the whole overlap-add — no scatter ops.  Semantics match
:mod:`lyssandra_tpu.oracle` (`extract_patches` / `reconstruct_from_patches` /
`remove_dc` / `contrast_normalize`) exactly: patches are columns of
``X in R^{p^2 x N}``, row-major over positions, row-major within a patch.

A fused Pallas kernel for extract+dc+normalize lives in
:mod:`lyssandra_tpu.ops.pallas_patches`; this module is the XLA reference
path and the API the rest of the framework uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def n_patches(H: int, W: int, p: int, stride: int = 1) -> tuple[int, int]:
    """Number of patch positions (rows, cols)."""
    return (H - p) // stride + 1, (W - p) // stride + 1


@functools.partial(jax.jit, static_argnums=(1, 2))
def extract_patches(img: jax.Array, p: int, stride: int = 1) -> jax.Array:
    """All p x p patches at the given stride, as columns of X.

    Grayscale (H, W) -> (p^2, N); color (H, W, C) -> (C p^2, N) with
    channels stacked as leading row blocks [ch0 p^2; ch1 p^2; ...] (the
    color-K-SVD layout: a color patch is one 3p^2 vector, so solvers and
    dictionaries are channel-agnostic).  Matches oracle.extract_patches.
    """
    if img.ndim == 3:
        return jnp.concatenate(
            [extract_patches(img[..., c], p, stride)
             for c in range(img.shape[2])],
            axis=0,
        )
    H, W = img.shape
    out = lax.conv_general_dilated_patches(
        img[None, None].astype(jnp.float32),
        filter_shape=(p, p),
        window_strides=(stride, stride),
        padding="VALID",
    )  # (1, p*p, H', W'); channel axis is the patch content, row-major (i, j)
    _, C, Hp, Wp = out.shape
    return out.reshape(C, Hp * Wp)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fold_patches(
    X: jax.Array, shape: tuple[int, int], p: int, stride: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Overlap-add: returns (sum image, count image).

    ``acc[i*s+a, j*s+b] += X[a*p+b, i*W'+j]`` for every patch position (i, j)
    and in-patch offset (a, b).  Implemented as p*p static interior-dilated
    pads — fully fusable, no scatters.  A 3-tuple shape (H, W, C) folds the
    C channel row-blocks of X into an (H, W, C) image (count shared).
    """
    if len(shape) == 3:
        H, W, C = shape
        rows = X.shape[0] // C
        accs = []
        cnt = None
        for c in range(C):
            acc_c, cnt = fold_patches(
                X[c * rows : (c + 1) * rows], (H, W), p, stride
            )
            accs.append(acc_c)
        return jnp.stack(accs, axis=-1), cnt[..., None]
    H, W = shape
    Hp, Wp = n_patches(H, W, p, stride)
    V = X.reshape(p, p, Hp, Wp)
    acc = jnp.zeros((H, W), dtype=X.dtype)
    for a in range(p):
        for b in range(p):
            lo_r, hi_r = a, H - (a + (Hp - 1) * stride + 1)
            lo_c, hi_c = b, W - (b + (Wp - 1) * stride + 1)
            acc = acc + lax.pad(
                V[a, b],
                jnp.zeros((), X.dtype),
                ((lo_r, hi_r, stride - 1), (lo_c, hi_c, stride - 1)),
            )
    ones = jnp.ones((Hp, Wp), dtype=X.dtype)
    cnt = jnp.zeros((H, W), dtype=X.dtype)
    for a in range(p):
        for b in range(p):
            lo_r, hi_r = a, H - (a + (Hp - 1) * stride + 1)
            lo_c, hi_c = b, W - (b + (Wp - 1) * stride + 1)
            cnt = cnt + lax.pad(
                ones,
                jnp.zeros((), X.dtype),
                ((lo_r, hi_r, stride - 1), (lo_c, hi_c, stride - 1)),
            )
    return acc, cnt


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def reconstruct_from_patches(
    X: jax.Array, shape: tuple[int, int], p: int, stride: int = 1
) -> jax.Array:
    """Plain overlap-add average (inverse of extract_patches);
    shape may be (H, W) or (H, W, C)."""
    acc, cnt = fold_patches(X, shape, p, stride)
    return acc / jnp.maximum(cnt, 1.0)


@functools.partial(jax.jit, static_argnums=(2, 4))
def weighted_reconstruct(
    X: jax.Array, y: jax.Array, p: int, lam: float | jax.Array, stride: int = 1
) -> jax.Array:
    """Elad-Aharon denoising blend ``(lam*y + sum R^T x_hat) / (lam + counts)``
    (grayscale or color y)."""
    acc, cnt = fold_patches(X, y.shape, p, stride)
    return (lam * y + acc) / (lam + cnt)


@jax.jit
def remove_dc(X: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Subtract per-column (per-patch) mean; return (centered, means)."""
    means = X.mean(axis=0)
    return X - means[None, :], means


@jax.jit
def contrast_normalize(
    X: jax.Array, eps: float = 1e-8
) -> tuple[jax.Array, jax.Array]:
    """Divide each column by max(||x||_2, eps); return (normalized, scales)."""
    scales = jnp.maximum(jnp.linalg.norm(X, axis=0), eps)
    return X / scales[None, :], scales
