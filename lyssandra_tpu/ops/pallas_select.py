"""Fused correlation + argmax selection kernel (the OMP hot step).

Profiled motivation (benchmarks/results/profile_bomp.json, real chip):
at the north-star shape (N=32768, p=64, K=1024) the XLA path spends
~0.73 ms on the (N, p) x (p, K) correlation matmul plus ~0.81 ms on the
max/min-iota argmax pair — both bound by HBM traffic on the materialized
(N, K) correlation array (134 MB written then read twice).  This kernel
tiles N over the grid, computes each (Nb, K) correlation block on the MXU
*in VMEM*, and reduces the argmax inline, so the correlation never touches
HBM: traffic per step drops from ~400 MB to ~8 MB (read r) + 0.25 MB
(read D) + 16 MB (write the padded index block).

The r1 attempt at this fusion lost 30x with (1024, 64) x (64, 512) tiles
INSIDE the solver scan (tiny per-program matmuls, no K-resident rows);
this version keeps the full K row per lane resident and was built from the
profile, not from guesswork.

Selection semantics match greedy._argmax_abs exactly: smallest index among
the maxima of |corr| (min-iota tie-break).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = lax.Precision.HIGHEST


def _kernel(r_ref, d_ref, k_ref, *, K, bf16):
    r = r_ref[...]                                    # (Nb, p)
    D = d_ref[...]                                    # (p, K)
    if bf16:
        corr = jnp.dot(r.astype(jnp.bfloat16), D.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    else:
        corr = jnp.dot(r, D, preferred_element_type=jnp.float32,
                       precision=_HI)
    s = jnp.abs(corr)
    k = jnp.argmax(s, axis=1).astype(jnp.int32)   # first max = min-iota
    k_ref[...] = jnp.broadcast_to(k[:, None], k_ref.shape)


@functools.partial(jax.jit, static_argnames=("bf16", "block", "interpret"))
def select_abs_argmax(
    r: jax.Array, D: jax.Array, *, bf16: bool = False, block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """argmin-tie argmax_k |r @ D|_k per lane, without materializing the
    (N, K) correlation in HBM.  r: (N, p), D: (p, K) -> k (N,) int32.

    Requires N % block == 0 and p, K tile-friendly (p mult of 8, K mult of
    128) — the OMP solvers check and fall back to the XLA pair otherwise.
    """
    N, p = r.shape
    K = D.shape[1]
    assert N % block == 0, (N, block)
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, bf16=bf16),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((block, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        interpret=interpret,
    )(r, D)
    return out[:, 0]


def selection_supported(N: int, p: int, K: int, dtype) -> bool:
    """Shapes the fused kernel handles (multiples the Mosaic tiling wants)."""
    return (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and N % 512 == 0
        and p % 8 == 0
        and K % 128 == 0
    )
