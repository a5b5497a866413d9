"""Fused Pallas patch-pipeline kernel: extract + DC removal + contrast
normalization in ONE VMEM pass (BASELINE north star: "the patch pipeline
fuses into a single Pallas kernel").

Design: the image lives whole in VMEM (a padded 512^2 float32 image is
~1 MB — far under the ~16 MB/core budget); the grid runs one program per
block of 8 patch-rows; each program materializes the (p^2, 8 * Wp_pad)
block of patch columns as p*p static shifted row-slices, then computes and
subtracts the per-patch mean and divides by the per-patch l2 norm before
anything is written back to HBM.  The XLA path (ops/patches.py) does this
as three kernels with two extra HBM round-trips of the (p^2, N) patch
matrix; here patches hit HBM exactly once, already preprocessed.

Mosaic tiling: output minor dims are padded to (8, 128) multiples
(Hp -> Hp8, Wp -> Wp128); the image is zero-padded so the padded patch
columns read in-bounds zeros, and the valid region is sliced out after the
call (a view-shaped gather XLA fuses into the consumer).

Stride-1 extraction only (the denoising hot path); other strides fall back
to the XLA path via ``fused_patch_pipeline``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyssandra_tpu.ops import patches as _xla

_RB = 8  # patch-rows per grid program


def _kernel(img_ref, *refs, p, Wpp, do_dc, do_norm, do_whiten, eps):
    if do_whiten:
        w_ref, o_ref, x_ref, mean_ref, scale_ref = refs
    else:
        x_ref, mean_ref, scale_ref = refs
    i = pl.program_id(0)
    W = img_ref.shape[1]
    for r in range(_RB):
        col = slice(r * Wpp, (r + 1) * Wpp)
        # pass 1: stage the raw shifted windows into the output block
        # (stores relayout; Mosaic cannot CONCATENATE vectors whose
        # sublane/lane offsets differ, so no big stacked value is built)
        for a in range(p):
            row = img_ref[pl.ds(i * _RB + r + a, 1), :]      # (1, W)
            for b in range(p):
                shifted = pltpu.roll(row, (W - b) % W, 1)
                x_ref[a * p + b, col] = jax.lax.slice(
                    shifted, (0, 0), (1, Wpp)
                )[0]
        # pass 2: aligned read-back, stats, transform in place
        X = x_ref[:, col]                                    # (p*p, Wpp)
        mean = jnp.mean(X, axis=0, keepdims=True)            # (1, Wpp)
        if do_dc:
            X = X - mean
        scale = jnp.sqrt(jnp.sum(X * X, axis=0, keepdims=True))
        scale = jnp.maximum(scale, eps)
        if do_norm:
            X = X / scale
        if do_whiten:
            # whitening epilogue on the MXU while the block is in VMEM:
            # Whitener.transform semantics W(x - m) = Wx - (Wm)
            X = jnp.dot(
                w_ref[...], X, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) - o_ref[...]
        if do_dc or do_norm or do_whiten:
            x_ref[:, col] = X
        mean_ref[r, :] = mean[0]
        scale_ref[r, :] = scale[0]


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("p", "do_dc", "do_norm", "eps", "interpret")
)
def fused_patch_pipeline_p1(
    img: jax.Array, p: int, *, do_dc: bool = True, do_norm: bool = False,
    whiten: tuple[jax.Array, jax.Array] | None = None,
    eps: float = 1e-8, interpret: bool = False,
):
    """Stride-1 fused pipeline.  Returns (X (p^2, Np), means (Np,),
    scales (Np,)): means are the removed DC components, scales the divided
    l2 norms (each still returned when its stage is disabled).

    whiten: optional (Wm (p^2, p^2), offset (p^2,)) applied as the kernel's
    MXU epilogue X <- Wm X - offset[:, None] (= Whitener.transform when
    offset = Wm @ whitener mean; see Whitener.fused_params) — the full
    north-star fusion: extract + DC + norm + whiten in one VMEM pass."""
    H, W = img.shape
    Hp, Wp = H - p + 1, W - p + 1
    Hpp = _round_up(Hp, _RB)          # padded patch-row count
    Wpp = _round_up(Wp, 128)          # padded patch-col count
    # pad the image so every padded patch position reads in-bounds zeros
    img_p = jnp.zeros((Hpp + p - 1, Wpp + p - 1), jnp.float32)
    img_p = img_p.at[:H, :W].set(img.astype(jnp.float32))

    do_whiten = whiten is not None
    inputs = [img_p]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if do_whiten:
        Wm, off = whiten
        inputs += [jnp.asarray(Wm, jnp.float32),
                   jnp.asarray(off, jnp.float32).reshape(p * p, 1)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]

    X, M, S = pl.pallas_call(
        functools.partial(
            _kernel, p=p, Wpp=Wpp, do_dc=do_dc, do_norm=do_norm,
            do_whiten=do_whiten, eps=eps,
        ),
        grid=(Hpp // _RB,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((p * p, _RB * Wpp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, Wpp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RB, Wpp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p * p, Hpp * Wpp), jnp.float32),
            jax.ShapeDtypeStruct((Hpp, Wpp), jnp.float32),
            jax.ShapeDtypeStruct((Hpp, Wpp), jnp.float32),
        ),
        interpret=interpret,
    )(*inputs)
    X = X.reshape(p * p, Hpp, Wpp)[:, :Hp, :Wp].reshape(p * p, Hp * Wp)
    return X, M[:Hp, :Wp].reshape(-1), S[:Hp, :Wp].reshape(-1)


def fused_patch_pipeline(
    img: jax.Array, p: int, stride: int = 1, *,
    do_dc: bool = True, do_norm: bool = False,
    whiten: tuple[jax.Array, jax.Array] | None = None, eps: float = 1e-8,
):
    """extract + (DC removal) + (contrast normalization) + (whitening),
    fused on TPU.

    Matches the composition of oracle.extract_patches / remove_dc /
    contrast_normalize / Whitener.transform.  Non-unit strides (and non-TPU
    backends) use the XLA ops — same results, more HBM round-trips.
    """
    on_tpu = jax.default_backend() == "tpu"
    if stride == 1 and on_tpu:
        return fused_patch_pipeline_p1(
            img, p, do_dc=do_dc, do_norm=do_norm, whiten=whiten, eps=eps
        )
    X = _xla.extract_patches(jnp.asarray(img, jnp.float32), p, stride)
    means = X.mean(axis=0)
    if do_dc:
        X = X - means[None, :]
    scales = jnp.maximum(jnp.linalg.norm(X, axis=0), eps)
    if do_norm:
        X = X / scales[None, :]
    if whiten is not None:
        Wm, off = whiten
        X = jnp.matmul(
            jnp.asarray(Wm, jnp.float32), X,
            precision=jax.lax.Precision.HIGHEST,
        ) - jnp.asarray(off, jnp.float32)[:, None]
    return X, means, scales
