"""Locality-constrained Linear Coding (Wang et al. 2010) — the LLC-style
encoder of the reference's feature-extraction toolkit (SURVEY.md §2.1
'Feature-extraction pipeline': "encode (sparse codes or LLC-style)").

Per signal x: take the k nearest atoms B (euclidean), solve the
shift-invariant constrained least squares

    min_c ||x - B c||^2 + lam ||c||^2   s.t.  1^T c = 1

via the analytic form  C = (B - 1 x^T)(B - 1 x^T)^T,
c ~ solve(C + lam tr(C) I, 1), c /= 1^T c  (the paper's Alg. 2 / eq. 4).

TPU-native: distances are one MXU matmul (unit-norm atoms make
||x - d||^2 = ||x||^2 + 1 - 2 d.x), k-NN via lax.top_k, and the (N, k, k)
batched solve is tiny (k <= 16).  All N signals in one device program —
no per-signal loop.  Matches oracle.llc per signal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("knn", "dense"))
def llc(
    D: jax.Array, X: jax.Array, knn: int = 5, lam: float = 1e-4,
    *, dense: bool = True,
):
    """LLC codes over unit-norm dictionary D (p, K) for X (p, N).

    Returns dense Gamma (K, N) (codes sum to 1 per column, zero off the
    k-NN support) or (idx (N, k), coeff (N, k)) when dense=False.
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    p, K = D.shape
    N = X.shape[1]

    # nearest atoms by euclidean distance: argmax of d.x (unit atoms make
    # the ||x||^2 + 1 terms constant per lane)
    sim = jnp.matmul(X.T, D, precision=_HI)            # (N, K)
    _, idx = lax.top_k(sim, knn)                       # (N, k)

    B = jnp.take(D.T, idx, axis=0)                     # (N, k, p)
    z = B - X.T[:, None, :]                            # center on x
    C = jnp.einsum("nkp,nlp->nkl", z, z, precision=_HI)
    tr = jnp.trace(C, axis1=1, axis2=2)
    Creg = C + (lam * tr + 1e-12)[:, None, None] * jnp.eye(
        knn, dtype=C.dtype
    )
    ones = jnp.ones((N, knn), C.dtype)
    if knn <= 16:
        # tiny batched LAPACK is a TPU anti-pattern (measured: a
        # (32k, 8, 8) SPD solve is 0.67 ms as CG einsum matvecs vs 69 ms
        # via LU — CLAUDE.md); Creg is SPD, CG is exact in <= knn
        # iterations (+2 slack), fully unrolled at these static sizes
        def mv(v):
            return jnp.einsum("nkl,nl->nk", Creg, v, precision=_HI)

        c = jnp.zeros_like(ones)
        res = ones
        pv = res
        rs = jnp.sum(res * res, axis=1)
        for _ in range(knn + 2):
            Mp = mv(pv)
            al = rs / (jnp.sum(pv * Mp, axis=1) + 1e-30)
            c = c + al[:, None] * pv
            res = res - al[:, None] * Mp
            rs2 = jnp.sum(res * res, axis=1)
            pv = res + (rs2 / (rs + 1e-30))[:, None] * pv
            rs = rs2
    else:
        c = jnp.linalg.solve(Creg, ones[..., None])[..., 0]
    c = c / jnp.sum(c, axis=1, keepdims=True)
    if not dense:
        return idx, c
    G = jnp.zeros((N, K), C.dtype).at[
        jnp.arange(N)[:, None], idx
    ].add(c)
    return G.T
