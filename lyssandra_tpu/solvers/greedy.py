"""Batched greedy sparse solvers: OMP, Batch-OMP, group OMP, thresholding.

TPU-native design (SURVEY.md §7 step 3): every solver is a fixed-trip-count
``lax.scan`` over pursuit steps t = 1..T, with *all* N signals advancing in
lock-step as lanes of batched (N, ...) arrays.  Data-dependent stopping
(error-constrained mode, dependent-atom breakdown) never branches: converged
lanes are frozen by a ``done`` mask and carry their state unchanged, which
preserves bitwise stability of finished lanes and keeps control flow static
for XLA.

Progressive Cholesky (Rubinstein/Zibulevsky/Elad 2008, Alg. 2) is maintained
as the *inverse* factor ``Linv = L^{-1}``, appended one row per step:

    L_t = [[L, 0], [w^T, l]]  =>  Linv_t = [[Linv, 0], [-l w^T Linv, l]],
    w = Linv g,  l = 1/sqrt(1 - ||w||^2),  g = G[I, k_new].

This turns every per-step solve into two batched (N, T, T) x (N, T) matvecs
on the VPU — no ``triangular_solve`` calls, no per-lane dynamic shapes.  The
correlation refresh ``alpha = alpha0 - Gamma_I^T G_I`` is one dense
(N, K) x (K, K) matmul per step that lands on the MXU.

Semantics match ``oracle.batch_omp`` / ``oracle.omp`` / ``oracle.group_omp``
per signal (tests/test_greedy.py pins fp32-vs-fp64 tolerances).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


class GreedyResult(NamedTuple):
    """Compact result of a batched greedy pursuit.

    idx:   (N, T) int32 — selected atom per step (0-padded after stop).
    gamma: (N, T) f32   — coefficients for idx (0 after stop).
    err:   (N,)   f32   — final squared residual norm estimate.
    nsel:  (N,)   int32 — number of atoms actually selected.
    """

    idx: jax.Array
    gamma: jax.Array
    err: jax.Array
    nsel: jax.Array

    def dense(self, K: int) -> jax.Array:
        """Dense code matrix Gamma in R^{K x N} (oracle layout)."""
        N, T = self.idx.shape
        valid = jnp.arange(T)[None, :] < self.nsel[:, None]
        C = jnp.zeros((N, K), self.gamma.dtype)
        C = C.at[jnp.arange(N)[:, None], self.idx].add(
            jnp.where(valid, self.gamma, 0.0)
        )
        return C.T

    def to_csc(self, K: int):
        """scipy.sparse CSC matrix (K, N) — the reference's sparse code-
        matrix output format (SURVEY.md §2.1 sparse_encoder 'returns dense
        or sparse code matrix') without ever materializing (K, N) dense:
        at K=1024, N=1e6, T=8 that is 64 MB of triplets vs 4 GB dense."""
        import numpy as np
        from scipy import sparse

        idx = np.asarray(self.idx)
        gamma = np.asarray(self.gamma)
        N, T = idx.shape
        valid = np.arange(T)[None, :] < np.asarray(self.nsel)[:, None]
        cols = np.repeat(np.arange(N), T)[valid.ravel()]
        rows = idx.ravel()[valid.ravel()]
        vals = gamma.ravel()[valid.ravel()]
        M = sparse.csc_matrix((vals, (rows, cols)), shape=(K, N))
        M.eliminate_zeros()      # padded group-member slots carry 0s
        return M

    @staticmethod
    def concatenate(results: "list[GreedyResult]") -> "GreedyResult":
        """Stack per-block results along the signal axis."""
        return GreedyResult(*(
            jnp.concatenate([getattr(r, f) for r in results], axis=0)
            for f in GreedyResult._fields
        ))


def _append_cholesky_inv(Linv, g, t):
    """Append one row to the progressive inverse-Cholesky factor.

    Linv: (N, T, T) with rows >= t zero; g: (N, T) = G[I, k_new] (entries
    >= t are ignored because Linv's columns there are zero).  Returns
    (Linv', nu) where nu = 1 - ||w||^2 (breakdown indicator).
    """
    T = Linv.shape[-1]
    # HIGHEST precision: DEFAULT lowers these matvecs to bf16 on TPU,
    # which degrades the progressive factor to ~3 digits
    w = jnp.einsum("ntj,nj->nt", Linv, g, precision=_HI)
    nu = 1.0 - jnp.sum(w * w, axis=-1)
    linv = lax.rsqrt(jnp.maximum(nu, 1e-12))
    newrow = -linv[:, None] * jnp.einsum("nt,ntj->nj", w, Linv,
                                         precision=_HI)
    e_t = jax.nn.one_hot(t, T, dtype=Linv.dtype)
    newrow = newrow + linv[:, None] * e_t[None, :]
    Linv = Linv + e_t[None, :, None] * newrow[:, None, :]
    return Linv, nu


def _solve_gamma(Linv, a0sel):
    """gamma = (L L^T)^{-1} a0_I = Linv^T (Linv a0_I), batched."""
    y = jnp.einsum("ntj,nj->nt", Linv, a0sel, precision=_HI)
    return jnp.einsum("njt,nj->nt", Linv, y, precision=_HI)


def _argmax_abs(A):
    """First index of the max |A[n, :]| per lane, TPU-fast.

    jnp.argmax's index-tracking reduction lowers poorly on TPU (~20x slower
    than a plain max); a max followed by a min-over-matching-iota is
    mathematically identical (first match wins ties, like np.argmax) and
    lowers to two cheap reductions.
    """
    N, K = A.shape
    s = jnp.abs(A)
    mx = jnp.max(s, axis=1, keepdims=True)
    iota = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    return jnp.min(jnp.where(s == mx, iota, K), axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("T", "eps_mode", "precision")
)
def _batch_omp_impl(G, Dt, A0, xnormsq, eps, *, T, eps_mode, precision):
    """Scan body design notes (all TPU-lowering-driven, measured):

    - Correlation refresh ``alpha = alpha0 - Gamma_dense G`` as ONE dense
      (N, K) x (K, K) MXU matmul per step.  The 'cheap' alternative —
      gathering the selected Gram rows — loses badly: per-lane (N, K) row
      gathers run ~20x slower than the matmul on TPU.
    - No selected-atom mask: re-selecting an atom implies the residual
      correlation is pure fp noise; the progressive Cholesky then breaks
      down (nu ~ 0) and the lane freezes — exactly the oracle's
      ``if k in I: break``.  This avoids a (N, K) mask update and the
      pathologically slow where(-inf) masked argmax.
    - The Cholesky append needs g = G[I, k_new]; instead of touching G's
      rows it uses gathered dictionary columns: g = Dsel . d_k with
      Dsel (N, T, p), d_k (N, p) — p << K, so the gather is tiny.
    """
    N, K = A0.shape
    p = Dt.shape[1]
    carry = dict(
        C=jnp.zeros((N, K), A0.dtype),          # dense codes so far
        Dsel=jnp.zeros((N, T, p), A0.dtype),    # selected atoms (columns of D)
        Linv=jnp.zeros((N, T, T), A0.dtype),
        idx=jnp.zeros((N, T), jnp.int32),
        a0sel=jnp.zeros((N, T), A0.dtype),
        done=jnp.zeros((N,), bool),
        err=xnormsq,
        nsel=jnp.zeros((N,), jnp.int32),
        gamma=jnp.zeros((N, T), A0.dtype),
    )

    def step(c, t):
        # Stop BEFORE adding an atom (oracle checks err at loop top).
        stop = c["done"]
        if eps_mode:
            stop = stop | (c["err"] <= eps * eps)

        Alpha = A0 - jnp.matmul(c["C"], G, precision=precision)
        k = _argmax_abs(Alpha)

        dk = jnp.take(Dt, k, axis=0)                       # (N, p)
        g = jnp.einsum("ntp,np->nt", c["Dsel"], dk, precision=precision)
        Linv, nu = _append_cholesky_inv(c["Linv"], g, t)
        bad = nu <= 1e-6              # dependent or duplicate atom

        Dsel = lax.dynamic_update_slice_in_dim(
            c["Dsel"], dk[:, None, :], t, axis=1
        )
        idx = lax.dynamic_update_slice_in_dim(c["idx"], k[:, None], t, axis=1)
        a0k = jnp.take_along_axis(A0, k[:, None], axis=1)
        a0sel = lax.dynamic_update_slice_in_dim(c["a0sel"], a0k, t, axis=1)
        gamma = _solve_gamma(Linv, a0sel)

        C = jnp.zeros_like(c["C"]).at[
            jnp.arange(N)[:, None], idx
        ].add(gamma)
        err = xnormsq - jnp.sum(gamma * a0sel, axis=1)

        frozen = stop | bad
        fz = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        out = dict(
            C=fz(C, c["C"]),
            Dsel=fz(Dsel, c["Dsel"]),
            Linv=fz(Linv, c["Linv"]),
            idx=fz(idx, c["idx"]),
            a0sel=fz(a0sel, c["a0sel"]),
            done=frozen,
            err=fz(err, c["err"]),
            nsel=jnp.where(frozen, c["nsel"], c["nsel"] + 1),
            gamma=fz(gamma, c["gamma"]),
        )
        return out, None

    carry, _ = lax.scan(step, carry, jnp.arange(T))
    valid = jnp.arange(T)[None, :] < carry["nsel"][:, None]
    return GreedyResult(
        idx=carry["idx"],
        gamma=jnp.where(valid, carry["gamma"], 0.0),
        err=carry["err"],
        nsel=carry["nsel"],
    )


def batch_omp(
    D: jax.Array, X: jax.Array, T: int, eps: float | None = None,
    *, precision=_HI, dense: bool = True, refresh: str = "auto",
    corr_dtype: str = "f32",
):
    """Batch-OMP: progressive Cholesky over the precomputed Gram
    (oracle.batch_omp semantics; per-patch parity tested).

    D: (p, K) unit-norm dictionary.  X: (p, N) signals.  T-sparse mode
    (eps=None) or error-constrained mode (stop when ||r||_2 <= eps, never
    exceeding T atoms).  Returns Gamma (K, N) if dense, else GreedyResult.

    refresh: how the per-step correlation vector alpha = D^T r is updated.
      'gram'     — Rubinstein's alpha = alpha0 - G_I gamma, a dense
                   (N, K) x (K, K) MXU matmul per step: 2 N K^2 flops.
      'residual' — alpha = (x - D_I gamma)^T D: 4 N p K flops per step.
      'auto'     — pick by flop count (residual iff 2p < K).
    The classic CPU analysis favors 'gram' (residuals cost cache misses);
    on the MXU the inequality is pure flops and flips for overcomplete
    dictionaries (p << K) — measured 7.8x faster at p=64, K=1024, with
    identical supports and ~1e-6 coefficient agreement.  The progressive
    Cholesky machinery is shared either way.
    """
    p, K = D.shape
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    # The fused-kernel gate sits ABOVE the refresh choice: gram-vs-
    # residual is a heuristic between the two XLA *scan* forms, and the
    # fused kernel beats both wherever it is supported.  (r9: at p=512,
    # K=1024 the 2p<K test picked 'gram' and silently bypassed the
    # kernel — 468k vs 1.87M p/s, the whole p-sweep cliff.)  An explicit
    # refresh='gram' still forces the Gram scan (A/B and test hook).
    if refresh != "gram" and _fused_supported(
        D, X, precision, corr_dtype, eps
    ):
        return _omp_fused_result(D, X, T, eps, dense=dense)
    if refresh == "auto":
        refresh = "residual" if 2 * p < K else "gram"
    if refresh == "residual":
        res = _omp_impl(
            D, X, 0.0 if eps is None else float(eps),
            T=T, eps_mode=eps is not None, precision=precision,
            corr_dtype=corr_dtype,
        )
        return res.dense(K) if dense else res
    G = jnp.matmul(D.T, D, precision=precision)
    A0 = jnp.matmul(X.T, D, precision=precision)      # (N, K)
    xnormsq = jnp.sum(X * X, axis=0)
    res = _batch_omp_impl(
        G, D.T, A0, xnormsq, 0.0 if eps is None else float(eps),
        T=T, eps_mode=eps is not None, precision=precision,
    )
    return res.dense(K) if dense else res


@functools.partial(
    jax.jit,
    static_argnames=("T", "eps_mode", "precision", "corr_dtype",
                     "fused_select"),
)
def _omp_impl(D, X, eps, *, T, eps_mode, precision, corr_dtype="f32",
              fused_select=False):
    """Explicit-residual OMP (oracle.omp): correlations from r = x - D_I gamma.

    Cheaper than Batch-OMP on MXU when 2p << K (the big per-step matmul is
    (N, p) x (p, K) instead of (N, K) x (K, K)); exact residuals in eps mode.

    corr_dtype='bf16': the correlation matmul (selection ONLY — the
    Cholesky, solves and residuals stay fp32) runs with explicitly
    bf16-cast operands and fp32 accumulation — one MXU pass instead of
    HIGHEST's multi-pass fp32 emulation.  Selection is an argmax over
    correlations, so ~3 decimal digits decide only near-ties; parity is
    pinned by tests/test_greedy.py (support agreement on separated
    problems).
    """
    p, K = D.shape
    N = X.shape[1]
    Xt = X.T                                   # (N, p)
    D_sel = D.astype(jnp.bfloat16) if corr_dtype == "bf16" else D

    # Fused Pallas selection (ops/pallas_select.py) computes the (N, K)
    # correlation block-wise in VMEM and reduces the argmax inline.
    # MEASURED NEGATIVE (r2): standalone it beats the XLA matmul+argmax
    # pair (0.78 vs 0.89 ms at the north-star shape, exact same picks),
    # but wired INSIDE this scan the full solver drops 1.57M -> 0.93M
    # patches/s — the custom call acts as an optimization barrier across
    # the step's fusion graph.  Off by default; opt in via fused_select.
    from lyssandra_tpu.ops.pallas_select import (
        select_abs_argmax, selection_supported,
    )

    use_fused = fused_select and selection_supported(N, p, K, D.dtype)

    def select(r):
        if use_fused:
            return select_abs_argmax(r, D, bf16=corr_dtype == "bf16")
        if corr_dtype == "bf16":
            corr = jnp.matmul(r.astype(jnp.bfloat16), D_sel,
                              preferred_element_type=jnp.float32)
        else:
            corr = jnp.matmul(r, D_sel, precision=precision)
        return _argmax_abs(corr)
    xnormsq = jnp.sum(Xt * Xt, axis=1)
    carry = dict(
        r=Xt,
        Dsel=jnp.zeros((N, T, p), D.dtype),
        Linv=jnp.zeros((N, T, T), D.dtype),
        idx=jnp.zeros((N, T), jnp.int32),
        a0sel=jnp.zeros((N, T), D.dtype),
        done=jnp.zeros((N,), bool),
        err=xnormsq,
        nsel=jnp.zeros((N,), jnp.int32),
    )

    # eps-mode lanes are marked done as soon as their residual passes the
    # target, and the WHOLE loop exits early once every lane is done — a
    # lax.while_loop (bounded by T), not a fixed scan: denoising runs with
    # T_max=16..32 but most patches converge in 1-3 atoms.
    if eps_mode:
        carry["done"] = carry["done"] | (xnormsq <= eps * eps)

    def step(st):
        t, c = st
        stop = c["done"]

        k = select(c["r"])

        dk = jnp.take(D.T, k, axis=0)                      # (N, p)
        g = jnp.einsum("ntp,np->nt", c["Dsel"], dk, precision=precision)
        Linv, nu = _append_cholesky_inv(c["Linv"], g, t)
        bad = nu <= 1e-6

        Dsel = lax.dynamic_update_slice_in_dim(
            c["Dsel"], dk[:, None, :], t, axis=1
        )
        idx = lax.dynamic_update_slice_in_dim(c["idx"], k[:, None], t, axis=1)
        a0k = jnp.sum(dk * Xt, axis=1, keepdims=True)      # d_k^T x
        a0sel = lax.dynamic_update_slice_in_dim(c["a0sel"], a0k, t, axis=1)
        gamma = _solve_gamma(Linv, a0sel)

        r = Xt - jnp.einsum("nt,ntp->np", gamma, Dsel, precision=precision)
        err = jnp.sum(r * r, axis=1)

        frozen = stop | bad
        fz = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        err_out = fz(err, c["err"])
        done = frozen
        if eps_mode:
            done = done | (err_out <= eps * eps)
        out = dict(
            r=fz(r, c["r"]),
            Dsel=fz(Dsel, c["Dsel"]),
            Linv=fz(Linv, c["Linv"]),
            idx=fz(idx, c["idx"]),
            a0sel=fz(a0sel, c["a0sel"]),
            done=done,
            err=err_out,
            nsel=jnp.where(frozen, c["nsel"], c["nsel"] + 1),
        )
        return (t + 1, out)

    def cond(st):
        t, c = st
        return (t < T) & ~jnp.all(c["done"])

    _, carry = lax.while_loop(cond, step, (jnp.zeros((), jnp.int32), carry))
    gamma = _solve_gamma(carry["Linv"], carry["a0sel"])
    valid = jnp.arange(T)[None, :] < carry["nsel"][:, None]
    return GreedyResult(
        idx=carry["idx"],
        gamma=jnp.where(valid, gamma, 0.0),
        err=carry["err"],
        nsel=carry["nsel"],
    )


def _fused_supported(D, X, precision, corr_dtype, eps) -> bool:
    p, K = D.shape
    return (
        jax.default_backend() == "tpu"
        and D.dtype == jnp.float32
        and X.dtype == jnp.float32
        and precision is _HI
        and corr_dtype == "f32"
        # eps mode rides the per-block-early-exit ref-state kernel
        # (ops/pallas_omp._kernel_eps_exit): 2.7x the XLA scan at a
        # mean-nsel-5 32k-lane probe on chip (r7).  The r2-r6 negative
        # ("scan's global early exit beats the always-T fused kernel at
        # denoise shapes") EXPIRED when the kernel learned to skip steps
        # per 512-lane block — raster-contiguous blocks are spatially
        # coherent, so most blocks exit after a few steps.
        # p and K need not be tile-aligned: _omp_fused_call zero-pads rows
        # and atoms, which is BITWISE neutral (zero atoms have exactly-zero
        # correlation and are never selected; zero rows only append +0.0
        # terms to reductions) — this is what lets SRC (K = n_train,
        # arbitrary) and LC-KSVD predict (K=500) ride the fused kernel
        and p <= 512
    )


@functools.partial(
    jax.jit, static_argnames=("T", "eps", "eps_mode", "dense", "interpret")
)
def _omp_fused_call(D, X, *, T, eps, eps_mode, dense, interpret=False):
    """Jitted wrapper around the full-fused Pallas solver: lane padding,
    the solve, un-padding, and (optionally) the dense scatter are ONE
    device program — the eager glue was costing 10x at small problem
    sizes (config 1: 8 dispatches/launch over the ~ms-latency tunnel)."""
    from lyssandra_tpu.ops.pallas_omp import omp_fused

    p0, K0 = D.shape
    N = X.shape[1]
    # zero-pad rows to the 8-sublane tile and atoms to the 128-lane tile —
    # bitwise neutral (zero atoms: exactly-zero correlation, never win the
    # argmax; zero rows: only +0.0 terms in every reduction)
    pp = -(-p0 // 8) * 8
    Kp = -(-K0 // 128) * 128
    if pp != p0:
        D = jnp.pad(D, ((0, pp - p0), (0, 0)))
        X = jnp.pad(X, ((0, pp - p0), (0, 0)))
    if Kp != K0:
        D = jnp.pad(D, ((0, 0), (0, Kp - K0)))
    # block=512 + the exact-3-split dk fetch: 5.21M vs 3.64M patches/s for
    # the r2 default (block=256, HIGHEST dk) in the same chip session,
    # BITWISE-identical idx/gamma (benchmarks/results/ab_fused.json).
    # (K, block) f32 intermediates live in the ~16 MB VMEM budget: halve
    # the block beyond K=2048 (CLAUDE.md measured limits).  Wider blocks
    # under a RAISED budget are a measured negative at this K: b1024/b2048
    # gain ~5% at a 262k dispatch but lose 4-6% at the 1M-dispatch
    # headline shape (ab_block_vmem.json, r10 chip).  The budget is
    # consumed by BOTH the (K, block) live set (corr/|corr|/iota/select,
    # ~4 deep) and the K-proportional dictionary residency (D, D^T and
    # their split copies) — K=4096 at block=256 measured 17.35 MB scoped
    # (1.35 MB over), so the ladder halves again past K=3072 and keeps
    # the (K, block) tile <= 2 MB beyond that (r9 scale-envelope run).
    vmem_limit_mb = None
    if Kp <= 2048:
        block = 512
        dk_mode = "split3"
    elif Kp <= 3072:
        block = 256
        dk_mode = "split3"
    else:
        # huge-K regime: Mosaic's scoped-vmem accounting defeats simple
        # live-set models — at K=4096 shrinking the block RAISED scoped
        # usage (17.35M at b256 -> 18.48M at b128) and dropping the
        # split-dk copies raised it further (23.81M, r9 chip).  The 16MB
        # scoped limit is a COMPILER default, not hardware (v5e VMEM is
        # 128MB): raise it via CompilerParams for this regime instead of
        # fighting the estimator.
        block = 256
        dk_mode = "split3"
        vmem_limit_mb = 40
    if pp > 256:
        # large-p regime: the T x (p, block) selected-atom state (7.3 MB
        # at p=448/T=8/b512) overflows the default the same way huge K
        # does (24.2M scoped measured at p=448, r9).  p=512 verified at
        # 64MB (1.88M p/s, b512); 40MB suffices through p=448 (1.94M).
        # Combine with the huge-K budget rather than skip (ADVICE r3):
        # huge K AND large p need the max of both regimes' budgets.
        vmem_limit_mb = max(vmem_limit_mb or 0, 40 if pp <= 448 else 64)
    if eps_mode:
        # the eps-exit kernel holds its solver state in VMEM scratch
        # ((p + T^2 + T*p) rows of f32 lanes) on top of the (K, block)
        # correlation — shrink the lane block to keep scratch under ~6 MB
        while block > 128 and (pp + T * T + T * pp) * block * 4 > 6e6:
            block //= 2
    Np = -(-N // block) * block
    if Np != N:
        X = jnp.concatenate(
            [X, jnp.zeros((X.shape[0], Np - N), X.dtype)], axis=1
        )
    idx, gamma, err, nsel = omp_fused(
        D, X, T=T, eps=eps, eps_mode=eps_mode, block=block,
        dk_mode=dk_mode, interpret=interpret,
        vmem_limit_mb=vmem_limit_mb,
    )
    res = GreedyResult(idx[:N], gamma[:N], err[:N], nsel[:N])
    return res.dense(K0) if dense else res


def _omp_fused_result(D, X, T, eps, dense=False):
    """Full-fused Pallas solve (ops/pallas_omp.py).  2.8x the XLA scan at
    the north-star shape with EXACT support parity (measured r2)."""
    return _omp_fused_call(
        D, X, T=T, eps=0.0 if eps is None else float(eps),
        eps_mode=eps is not None, dense=dense,
    )


def omp(
    D: jax.Array, X: jax.Array, T: int, eps: float | None = None,
    *, precision=_HI, dense: bool = True, corr_dtype: str = "f32",
    fused: bool = True,
):
    """Orthogonal Matching Pursuit with explicit residual (oracle.omp)."""
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    if fused and _fused_supported(D, X, precision, corr_dtype, eps):
        return _omp_fused_result(D, X, T, eps, dense=dense)
    res = _omp_impl(
        D, X, 0.0 if eps is None else float(eps),
        T=T, eps_mode=eps is not None, precision=precision,
        corr_dtype=corr_dtype,
    )
    return res.dense(D.shape[1]) if dense else res


@functools.partial(
    jax.jit, static_argnames=("T", "eps_mode", "precision")
)
def _masked_omp_impl(D, X, M, eps, *, T, eps_mode, precision):
    """OMP over per-lane OBSERVED coordinates (oracle.masked_omp): codes
    M o x over masked atoms M o d_k, selection |d^T r| / ||M o d_k||.

    Same batched structure as _omp_impl — the mask rides along for free:
    the residual is masked by construction (x' and every selected atom
    are), so the correlation matmul needs no masking; only the gathered
    atom and the precomputed per-lane atom norms do.
    """
    p, K = D.shape
    N = X.shape[1]
    Mt = M.T.astype(D.dtype)                   # (N, p)
    Xt = X.T * Mt                              # observed coords only
    # per-lane masked atom norms: one MXU matmul, constant over steps
    nrm = jnp.sqrt(jnp.maximum(
        jnp.matmul(Mt, D * D, precision=precision), 0.0
    ))                                         # (N, K)
    invalid = nrm <= 1e-6
    xnormsq = jnp.sum(Xt * Xt, axis=1)
    carry = dict(
        r=Xt,
        Dsel=jnp.zeros((N, T, p), D.dtype),
        Linv=jnp.zeros((N, T, T), D.dtype),
        idx=jnp.zeros((N, T), jnp.int32),
        a0sel=jnp.zeros((N, T), D.dtype),
        done=(xnormsq <= eps * eps) if eps_mode
        else jnp.zeros((N,), bool),
        err=xnormsq,
        nsel=jnp.zeros((N,), jnp.int32),
    )

    def step(st):
        t, c = st
        stop = c["done"]
        corr = jnp.matmul(c["r"], D, precision=precision)  # (N, K)
        score = jnp.where(
            invalid, -1.0, jnp.abs(corr) / jnp.maximum(nrm, 1e-6)
        )
        mx = jnp.max(score, axis=1, keepdims=True)
        iota = lax.broadcasted_iota(jnp.int32, (N, K), 1)
        k = jnp.min(jnp.where(score == mx, iota, K), axis=1).astype(
            jnp.int32
        )
        dk = jnp.take(D.T, k, axis=0) * Mt                 # masked atom
        g = jnp.einsum("ntp,np->nt", c["Dsel"], dk, precision=precision)
        Linv, nu = _append_cholesky_inv(c["Linv"], g / jnp.maximum(
            jnp.take_along_axis(nrm, k[:, None], 1), 1e-6), t)
        # NOTE: the factor is built over UNIT-normalized masked atoms
        # (d~ = dk / ||dk||) for conditioning; coefficients are rescaled
        # back below
        nk = jnp.take_along_axis(nrm, k[:, None], 1)[:, 0]
        bad = (nu <= 1e-6) | (nk <= 1e-6)
        dkn = dk / jnp.maximum(nk, 1e-6)[:, None]
        Dsel = lax.dynamic_update_slice_in_dim(
            c["Dsel"], dkn[:, None, :], t, axis=1
        )
        idx = lax.dynamic_update_slice_in_dim(
            c["idx"], k[:, None], t, axis=1
        )
        a0k = jnp.sum(dkn * Xt, axis=1, keepdims=True)
        a0sel = lax.dynamic_update_slice_in_dim(c["a0sel"], a0k, t, axis=1)
        gamma = _solve_gamma(Linv, a0sel)
        r = Xt - jnp.einsum("nt,ntp->np", gamma, Dsel, precision=precision)
        err = jnp.sum(r * r, axis=1)

        frozen = stop | bad
        fz = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        done = frozen
        err_out = fz(err, c["err"])
        if eps_mode:
            done = done | (err_out <= eps * eps)
        out = dict(
            r=fz(r, c["r"]), Dsel=fz(Dsel, c["Dsel"]),
            Linv=fz(Linv, c["Linv"]), idx=fz(idx, c["idx"]),
            a0sel=fz(a0sel, c["a0sel"]), done=done, err=err_out,
            nsel=jnp.where(frozen, c["nsel"], c["nsel"] + 1),
        )
        return (t + 1, out)

    def cond(st):
        t, c = st
        return (t < T) & ~jnp.all(c["done"])

    _, c = lax.while_loop(cond, step, (jnp.zeros((), jnp.int32), carry))
    gamma = _solve_gamma(c["Linv"], c["a0sel"])
    # rescale: codes were solved over unit-normalized masked atoms
    sel_nrm = jnp.take_along_axis(nrm, c["idx"], axis=1)
    gamma = gamma / jnp.maximum(sel_nrm, 1e-6)
    valid = jnp.arange(T)[None, :] < c["nsel"][:, None]
    return GreedyResult(
        idx=c["idx"], gamma=jnp.where(valid, gamma, 0.0),
        err=c["err"], nsel=c["nsel"],
    )


def masked_omp(
    D: jax.Array, X: jax.Array, M: jax.Array, T: int,
    eps: float | None = None, *, precision=_HI, dense: bool = True,
):
    """Masked (inpainting) OMP: per-lane observed-coordinate pursuit
    (oracle.masked_omp).  M: (p, N) 0/1 observation mask."""
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    M = jnp.asarray(M, jnp.float32)
    res = _masked_omp_impl(
        D, X, M, 0.0 if eps is None else float(eps),
        T=T, eps_mode=eps is not None, precision=precision,
    )
    return res.dense(D.shape[1]) if dense else res


def _chol_small_inv(S, gs: int, jitter):
    """Unrolled Cholesky of batched tiny SPD blocks + inverse factor.

    S: (N, gs, gs); jitter: scalar or (N,) added to the diagonal.  Returns
    (Linv (N, gs, gs) with rows above the diagonal zero, ok (N,) = every
    pivot positive).  Why unrolled: batched tiny LAPACK ops are a TPU
    anti-pattern — cholesky + triangular_solve at (32768, 8, 8) measure
    ~28 ms on chip vs <1 ms as lanes-batched vector ops (the same finding
    that rebuilt nn_omp's NNLS and LARS's homotopy solves, r3).
    gs is static and small (<= ~8), so the gs^3/3 unrolled ops fuse.
    """
    L = [[None] * gs for _ in range(gs)]
    ok = None
    for i in range(gs):
        s = S[:, i, i] + jitter
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        okk = s > 0
        ok = okk if ok is None else (ok & okk)
        dii = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[i][i] = dii
        inv_dii = 1.0 / dii
        for j in range(i + 1, gs):
            s2 = S[:, j, i]
            for k in range(i):
                s2 = s2 - L[j][k] * L[i][k]
            L[j][i] = s2 * inv_dii
    zero = jnp.zeros_like(L[0][0])
    inv = [[zero] * gs for _ in range(gs)]
    for j in range(gs):
        for i in range(j, gs):
            acc = -sum((L[i][k] * inv[k][j] for k in range(j, i)), zero)
            if i == j:
                acc = acc + 1.0
            inv[i][j] = acc / L[i][i]
    Linv = jnp.stack(
        [jnp.stack(row, axis=-1) for row in inv], axis=-2
    )                                                 # (N, gs, gs)
    return Linv, ok


@functools.partial(
    jax.jit,
    static_argnames=("n_groups", "gs", "T", "eps_mode", "precision"),
)
def _group_omp_impl(D, X, members, mmask, member_oh, eps,
                    *, n_groups, gs, T, eps_mode, precision):
    """Progressive BLOCK inverse-Cholesky group pursuit, batch_omp-style.

    members: (n_groups, gs) atom ids, padded groups 0-filled; mmask: matching
    validity mask.  The active set lives in T group slots of gs atom slots
    each (A = T*gs total), so per-lane state is O(A^2) — independent of K
    (the old masked-(K, K)-solve design needed O(N K^2) memory and could not
    run at K=1024, N=32k).  Each step appends a gs-wide block to the inverse
    Cholesky factor:

        W = Linv g_cross,  S = G_new - W^T W,  Lb = chol(S),
        new rows = [-Lb^{-1} W^T Linv | Lb^{-1}].

    Padded atom slots carry identity rows (zero coupling, zero rhs) so their
    coefficients are exactly 0.  Lanes freeze when every group is selected
    (oracle no-ops there), on eps convergence, or on Cholesky breakdown.
    """
    p, K = D.shape
    N = X.shape[1]
    A = T * gs
    Xt = X.T                                        # (N, p)
    xnormsq = jnp.sum(Xt * Xt, axis=1)
    eye_gs = jnp.eye(gs, dtype=D.dtype)
    carry = dict(
        r=Xt,                                       # explicit residual
        Dsel=jnp.zeros((N, A, p), D.dtype),         # selected atoms
        Linv=jnp.zeros((N, A, A), D.dtype),
        idx=jnp.zeros((N, A), jnp.int32),
        smask=jnp.zeros((N, A), D.dtype),           # valid-slot mask
        a0sel=jnp.zeros((N, A), D.dtype),
        gsel=jnp.zeros((N, n_groups), bool),
        done=jnp.zeros((N,), bool),
        err=xnormsq,
        gamma=jnp.zeros((N, A), D.dtype),
        nsel=jnp.zeros((N,), jnp.int32),
    )

    def step(c, t):
        stop = c["done"] | jnp.all(c["gsel"], axis=1)
        if eps_mode:
            stop = stop | (c["err"] <= eps * eps)

        corr = jnp.matmul(c["r"], D, precision=precision)     # (N, K)
        # group scores ||D_g^T r||^2; selected groups masked via the
        # subtract-big trick (where(-inf)+argmax lowers poorly on TPU)
        S = jnp.matmul(corr * corr, member_oh, precision=precision)
        S = S - 1e30 * c["gsel"].astype(D.dtype)
        mx = jnp.max(S, axis=1)
        iota = lax.broadcasted_iota(jnp.int32, (N, n_groups), 1)
        gbest = jnp.min(
            jnp.where(S == mx[:, None], iota, n_groups), axis=1
        ).astype(jnp.int32)

        midx = jnp.take(members, gbest, axis=0)               # (N, gs)
        mvalid = jnp.take(mmask, gbest, axis=0)               # (N, gs)
        dnew = jnp.take(D.T, midx, axis=0) * mvalid[..., None]  # (N, gs, p)

        # block append to the inverse Cholesky factor
        g_cross = jnp.einsum(
            "nap,ngp->nag", c["Dsel"], dnew, precision=precision
        )
        W = jnp.einsum("nab,nbg->nag", c["Linv"], g_cross,
                       precision=precision)    # (N, A, gs)
        Gnn = jnp.einsum("ngp,nhp->ngh", dnew, dnew, precision=precision)
        Gnn = Gnn + eye_gs[None] * (1.0 - mvalid.astype(D.dtype))[:, :, None]
        Schur = Gnn - jnp.einsum("nag,nah->ngh", W, W,
                                 precision=precision)
        # rank-deficient blocks (a group can hold more atoms than p dims)
        # make Schur PSD-singular; a scaled jitter keeps the factorization
        # alive (ridge ~ min-norm; the refinement below drives the residual
        # to the span projection, matching the oracle's lstsq residual),
        # escalating x1e4 for lanes where fp32 rounding still breaks chol
        scale = jnp.max(jnp.abs(Schur), axis=(1, 2)) + 1e-3
        if gs <= 8:
            # lanes-batched unrolled factorization: tiny batched LAPACK
            # ops measure ~28 ms at (32k, 8, 8) on chip vs <1 ms unrolled
            Lbinv1, ok1 = _chol_small_inv(Schur, gs, 1e-9)
            Lbinv2, ok2 = _chol_small_inv(Schur, gs, 1e-2 * scale)
            Lbinv = jnp.where(ok1[:, None, None], Lbinv1, Lbinv2)
            bad = ~ok1 & ~ok2
            Lbinv = jnp.where(bad[:, None, None], eye_gs[None], Lbinv)
        else:
            # big groups: the unrolled graph is O(gs^3) ops and explodes
            # compile time (619 s at gs=20 on CPU) — keep LAPACK there
            Lb = jnp.linalg.cholesky(Schur + 1e-9 * eye_gs[None])
            retry = ~jnp.all(jnp.isfinite(Lb), axis=(1, 2))
            Lb2 = jnp.linalg.cholesky(
                Schur + (1e-2 * scale)[:, None, None] * eye_gs[None]
            )
            Lb = jnp.where(retry[:, None, None], Lb2, Lb)
            bad = ~jnp.all(jnp.isfinite(Lb), axis=(1, 2))
            Lb = jnp.where(bad[:, None, None], eye_gs[None], Lb)
            Lbinv = lax.linalg.triangular_solve(
                Lb, jnp.broadcast_to(eye_gs[None], Lb.shape),
                left_side=True, lower=True,
            )
        newrows = -jnp.einsum(
            "ngh,nah,nab->ngb", Lbinv, W, c["Linv"]
        )                                                     # (N, gs, A)
        newrows = lax.dynamic_update_slice(
            newrows, Lbinv, (0, 0, t * gs)
        )
        Linv = lax.dynamic_update_slice(c["Linv"], newrows, (0, t * gs, 0))

        Dsel = lax.dynamic_update_slice(c["Dsel"], dnew, (0, t * gs, 0))
        idx = lax.dynamic_update_slice(c["idx"], midx, (0, t * gs))
        smask = lax.dynamic_update_slice(
            c["smask"], mvalid.astype(D.dtype), (0, t * gs)
        )
        a0new = jnp.einsum("ngp,np->ng", dnew, Xt, precision=precision)
        a0sel = lax.dynamic_update_slice(c["a0sel"], a0new, (0, t * gs))

        # iterative refinement: the wide active sets group OMP builds
        # (T * gs atoms, possibly ~p) condition far worse than plain OMP's,
        # and fp32 progressive Cholesky alone loses ~3 digits there
        gamma = _solve_gamma(Linv, a0sel)
        for _ in range(2):
            r = Xt - jnp.einsum(
                "na,nap->np", gamma, Dsel, precision=precision
            )
            gamma = gamma + _solve_gamma(
                Linv, jnp.einsum("nap,np->na", Dsel, r, precision=precision)
            )
        r = Xt - jnp.einsum("na,nap->np", gamma, Dsel, precision=precision)
        err = jnp.sum(r * r, axis=1)
        gsel = c["gsel"].at[jnp.arange(N), gbest].set(True)

        frozen = stop | bad
        fz = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        out = dict(
            r=fz(r, c["r"]),
            Dsel=fz(Dsel, c["Dsel"]),
            Linv=fz(Linv, c["Linv"]),
            idx=fz(idx, c["idx"]),
            smask=fz(smask, c["smask"]),
            a0sel=fz(a0sel, c["a0sel"]),
            gsel=fz(gsel, c["gsel"]),
            done=frozen,
            err=fz(err, c["err"]),
            gamma=fz(gamma, c["gamma"]),
            nsel=jnp.where(frozen, c["nsel"], c["nsel"] + 1),
        )
        return out, None

    carry, _ = lax.scan(step, carry, jnp.arange(T))
    res = GreedyResult(
        idx=carry["idx"],                         # (N, T*gs) slots
        gamma=carry["gamma"] * carry["smask"],    # padded slots -> 0
        err=carry["err"],
        nsel=(carry["nsel"] * gs).astype(jnp.int32),
    )
    return res


def group_omp(
    D: jax.Array, X: jax.Array, groups, T: int,
    eps: float | None = None, *, precision=_HI, dense: bool = True,
    fused: bool = True, interpret: bool = False, packed: bool = True,
):
    """Group OMP (oracle.group_omp): select argmax_g ||D_g^T r||, LS over the
    union of selected groups' atoms.  ``groups``: (K,) int array of group ids
    in [0, n_groups).  Returns dense Gamma (K, N), or with ``dense=False``
    a compact GreedyResult whose T*group_size slots hold the selected
    groups' atoms (padded group slots carry zero coefficients).

    TPU-first: fixed group-slot capacity with progressive block-Cholesky —
    per-lane state is O((T * group_size)^2), so K=1024 at N=32k fits HBM
    (the batch_omp design generalized to gs-wide appends).  On TPU in
    T-mode, the full-fused Pallas kernel (ops/pallas_group.py) runs all
    T steps per lane block in VMEM (``fused=False`` forces the XLA scan).
    """
    import numpy as np

    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    groups_np = np.asarray(groups, np.int64)
    n_groups = int(groups_np.max()) + 1
    gs = int(np.bincount(groups_np, minlength=n_groups).max())

    from lyssandra_tpu.ops.pallas_group import (
        group_omp_fused, group_omp_fused_supported,
    )

    T_eff = min(T, n_groups)
    if (
        fused and eps is None and precision is _HI
        and (interpret or group_omp_fused_supported(
            D.shape[0], n_groups, gs, T_eff
        ))
    ):
        N = X.shape[1]
        # block=256 measured best on chip (b512/b1024 were 0.7-0.87x of
        # it at K=1024/gs=4/T=4/N=32k): the kernel is VPU-issue bound on
        # its per-lane row ops, not bandwidth bound — wider blocks don't
        # help (b512 re-confirmed 0.71x on the packed variant, r9).
        # packed=True (r9 default, kept): the r5 interleaved duel
        # (probe_group_duel.json) puts the packed and plain fused
        # kernels at PARITY (median ratio 0.989, both swinging +-20%
        # pass to pass) — the r9 "packed +16%" and the r5 sequential
        # regen's "fused +25%" were both single-session orderings of
        # equivalent variants.  Both are ~1.4-1.7x the XLA scan
        # (ab_group_fused.py, results/group_omp_fused.json).
        block = 256 if not interpret else min(256, max(8, N))
        idx_f, gam_f, err_f, nsel_f, _ = group_omp_fused(
            D, X, groups_np, T_eff, block=block, interpret=interpret,
            packed=packed,
        )
        res = GreedyResult(idx_f, jnp.asarray(gam_f), err_f,
                           (nsel_f * gs).astype(jnp.int32))
        if not dense:
            return res
        K = D.shape[1]
        C = jnp.zeros((N, K), D.dtype).at[
            jnp.arange(N)[:, None], res.idx
        ].add(res.gamma)
        return C.T
    members = np.zeros((n_groups, gs), np.int32)
    mmask = np.zeros((n_groups, gs), bool)
    for g in range(n_groups):
        mem = np.where(groups_np == g)[0]
        members[g, : len(mem)] = mem
        mmask[g, : len(mem)] = True
    member_oh = jax.nn.one_hot(
        jnp.asarray(groups_np, jnp.int32), n_groups, dtype=D.dtype
    )
    res = _group_omp_impl(
        D, X, jnp.asarray(members), jnp.asarray(mmask), member_oh,
        0.0 if eps is None else float(eps),
        n_groups=n_groups, gs=gs, T=min(T, n_groups),
        eps_mode=eps is not None, precision=precision,
    )
    if not dense:
        return res
    N = X.shape[1]
    K = D.shape[1]
    C = jnp.zeros((N, K), D.dtype).at[
        jnp.arange(N)[:, None], res.idx
    ].add(res.gamma)
    return C.T


@functools.partial(
    jax.jit, static_argnames=("T", "nnls_rounds", "precision")
)
def _nn_omp_impl(D, X, *, T, nnls_rounds, precision):
    """Batched non-negative OMP (oracle.nn_omp semantics).

    Selection: argmax of the *signed* residual correlation; a lane freezes
    when its best correlation is <= 0 (no atom can reduce the residual with
    a nonnegative coefficient).  The per-step NNLS over the active set is
    a bounded Lawson-Hanson inner loop: solve the mask-restricted normal
    equations exactly (batched (T, T) solve), prune negative coefficients,
    re-solve — ``nnls_rounds`` times.  Positive-correlation selection makes
    the all-positive unconstrained solution the common case, so a few
    pruning rounds land on the exact NNLS solution; the r2 design ran 100
    accelerated-projected-gradient scan steps instead and was latency-bound
    (the solver is ~800 sequential tiny ops at T=8 that way).

    r2: residual form throughout — the correlation is one (N, p) x (p, K)
    matmul on the explicit residual (4NpK flops vs the Gram refresh's
    2NK^2, the batch_omp refresh='auto' rule) and the restricted-Gram
    append uses gathered-atom inner products instead of per-lane (N, K)
    Gram-row gathers (the measured-slow pattern, CLAUDE.md).
    """
    p, K = D.shape
    N = X.shape[1]
    Xt = X.T
    Dt = D.T
    xnormsq = jnp.sum(Xt * Xt, axis=1)
    carry = dict(
        r=Xt,                                   # explicit residual (N, p)
        Dsel=jnp.zeros((N, T, p), X.dtype),     # selected atoms
        Gsel=jnp.zeros((N, T, T), X.dtype),     # G[I, I]
        idx=jnp.zeros((N, T), jnp.int32),
        a0sel=jnp.zeros((N, T), X.dtype),
        smask=jnp.zeros((N, T), X.dtype),       # valid-slot mask
        done=jnp.zeros((N,), bool),
        gamma=jnp.zeros((N, T), X.dtype),
        nsel=jnp.zeros((N,), jnp.int32),
    )

    def step(c, t):
        Alpha = jnp.matmul(c["r"], D, precision=precision)   # (N, K)
        # exclude already-selected atoms (nonneg codes keep their alpha
        # positive-ish, so unlike plain OMP we mask explicitly — via the
        # max/min-iota trick to avoid the slow masked argmax)
        sel = jnp.zeros((N, K), X.dtype).at[
            jnp.arange(N)[:, None], c["idx"]
        ].add(c["smask"])
        s = Alpha - 1e30 * sel
        mx = jnp.max(s, axis=1)
        iota = lax.broadcasted_iota(jnp.int32, (N, K), 1)
        k = jnp.min(
            jnp.where(s == mx[:, None], iota, K), axis=1
        ).astype(jnp.int32)
        stop = c["done"] | (mx <= 0.0)

        # append to restricted Gram via atom inner products:
        # G[I, k] = Dsel . d_k (p << K, no Gram-row gathers)
        dk = jnp.take(Dt, k, axis=0)                         # (N, p)
        grow_sel = jnp.einsum(
            "ntp,np->nt", c["Dsel"], dk, precision=precision
        ) * c["smask"]                                       # (N, T)
        e_t = jax.nn.one_hot(t, T, dtype=X.dtype)
        Gsel = (
            c["Gsel"]
            + e_t[None, :, None] * grow_sel[:, None, :]
            + e_t[None, None, :] * grow_sel[:, :, None]
            + (e_t[:, None] * e_t[None, :])[None]
        )
        Dsel = lax.dynamic_update_slice_in_dim(
            c["Dsel"], dk[:, None, :], t, axis=1
        )
        idx = lax.dynamic_update_slice_in_dim(c["idx"], k[:, None], t, axis=1)
        a0k = jnp.sum(dk * Xt, axis=1, keepdims=True)        # d_k^T x
        a0sel = lax.dynamic_update_slice_in_dim(c["a0sel"], a0k, t, axis=1)
        smask = jnp.maximum(c["smask"], e_t[None, :])

        # NNLS: min_{g>=0} g^T Gsel g / 2 - a0sel^T g — bounded
        # Lawson-Hanson: solve the mask-restricted normal equations, prune
        # negatives, re-solve.  The masked solve is CG run T+2 steps: CG is
        # exact in <= dim(Krylov) = T iterations, and on this chip a
        # (32768, 8, 8) batched solve measures 0.67 ms as CG einsum
        # matvecs vs 28 ms (Cholesky + triangular_solve) / 69 ms (LU) —
        # tiny batched LAPACK ops are a TPU anti-pattern.
        eyeT = jnp.eye(T, dtype=X.dtype)
        pos = smask
        g = jnp.zeros_like(a0sel)

        def masked_cg(pos, rhs):
            mm = pos[:, :, None] * pos[:, None, :]
            Mm = Gsel * mm + eyeT[None] * jnp.where(
                pos > 0, 1e-8, 1.0
            )[:, :, None]

            def mv(v):
                return jnp.einsum("nts,ns->nt", Mm, v,
                                  precision=precision)

            x0 = jnp.zeros_like(rhs)
            r0 = rhs - mv(x0)

            def cg(carry, _):
                x, r, pv, rs = carry
                Mp = mv(pv)
                al = rs / (jnp.sum(pv * Mp, axis=1) + 1e-30)
                x = x + al[:, None] * pv
                r = r - al[:, None] * Mp
                rs2 = jnp.sum(r * r, axis=1)
                pv = r + (rs2 / (rs + 1e-30))[:, None] * pv
                return (x, r, pv, rs2), None

            (x, *_), _ = lax.scan(
                cg, (x0, r0, r0, jnp.sum(r0 * r0, axis=1)), None,
                length=T + 2,
            )
            return x * pos

        for _ in range(nnls_rounds):
            g = masked_cg(pos, a0sel * pos)
            pos = pos * (g > 0)
        gamma = jnp.maximum(g, 0.0) * pos

        r = Xt - jnp.einsum(
            "nt,ntp->np", gamma, Dsel, precision=precision
        )

        frozen = stop
        fz = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        out = dict(
            r=fz(r, c["r"]),
            Dsel=fz(Dsel, c["Dsel"]),
            Gsel=fz(Gsel, c["Gsel"]),
            idx=fz(idx, c["idx"]),
            a0sel=fz(a0sel, c["a0sel"]),
            smask=fz(smask, c["smask"]),
            done=frozen,
            gamma=fz(gamma, c["gamma"]),
            nsel=jnp.where(frozen, c["nsel"], c["nsel"] + 1),
        )
        return out, None

    carry, _ = lax.scan(step, carry, jnp.arange(T))
    err = (
        xnormsq
        - 2 * jnp.sum(carry["gamma"] * carry["a0sel"], axis=1)
        + jnp.einsum(
            "nt,ntj,nj->n", carry["gamma"], carry["Gsel"], carry["gamma"]
        )
    )
    return GreedyResult(
        idx=carry["idx"],
        gamma=carry["gamma"],
        err=err,
        nsel=carry["nsel"],
    )


@functools.partial(
    jax.jit, static_argnames=("T", "nnls_rounds", "precision")
)
def _nn_omp_impl_unrolled(D, X, *, T, nnls_rounds, precision):
    """Unrolled-step nn_omp (same semantics as ``_nn_omp_impl``).

    The scan form pays ``nnls_rounds * (T+2)`` CG matvecs on (N, T, T)
    at EVERY pursuit step even though step t's active system is only
    (t+1)-dimensional: 320 latency-bound tiny einsums at T=8 where
    ~180 growing-dimension ones suffice.  Python-unrolling the T steps
    (every shape static per step) sizes each masked-CG solve to its
    true dimension (t+2 iterations on (N, t+1, t+1) — CG is exact in
    <= dim iterations, +1 for the unit-eigenvalue cluster the masked
    diagonal adds), makes step 0 a closed-form divide, and shrinks the
    selection-exclusion scatter to ONE element per lane per step (the
    scan form re-scatters all T slots from scratch each step).  Gated
    to small static T by the caller: the unrolled graph grows O(T^2)
    ops and CPU compile time explodes beyond active dims ~10-12
    (CLAUDE.md unrolled-factorization limit).
    """
    p, K = D.shape
    N = X.shape[1]
    Xt = X.T
    Dt = D.T
    xnormsq = jnp.sum(Xt * Xt, axis=1)
    iota = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    rows = jnp.arange(N)

    def masked_cg(Gs, pos, rhs, iters):
        d = Gs.shape[1]
        mm = pos[:, :, None] * pos[:, None, :]
        Mm = Gs * mm + jnp.eye(d, dtype=rhs.dtype)[None] * jnp.where(
            pos > 0, 1e-8, 1.0
        )[:, :, None]

        def mv(v):
            return jnp.einsum("nts,ns->nt", Mm, v, precision=precision)

        x = jnp.zeros_like(rhs)
        res = rhs
        pv = res
        rs = jnp.sum(res * res, axis=1)
        for _ in range(iters):          # tiny static trip count: unroll
            Mp = mv(pv)
            al = rs / (jnp.sum(pv * Mp, axis=1) + 1e-30)
            x = x + al[:, None] * pv
            res = res - al[:, None] * Mp
            rs2 = jnp.sum(res * res, axis=1)
            pv = res + (rs2 / (rs + 1e-30))[:, None] * pv
            rs = rs2
        return x * pos

    r = Xt
    done = jnp.zeros((N,), bool)
    selpen = jnp.zeros((N, K), X.dtype)   # accumulated exclusion penalty
    Gsel = None                           # (N, t+1, t+1) restricted Gram
    Dstack = None                         # (N, t+1, p) selected atoms
    gamma = jnp.zeros((N, 0), X.dtype)
    a0sel = jnp.zeros((N, 0), X.dtype)
    smask = jnp.zeros((N, 0), X.dtype)
    idx = jnp.zeros((N, 0), jnp.int32)
    nsel = jnp.zeros((N,), jnp.int32)

    for t in range(T):
        Alpha = jnp.matmul(r, D, precision=precision)        # (N, K)
        s = Alpha - selpen
        mx = jnp.max(s, axis=1)
        k = jnp.min(
            jnp.where(s == mx[:, None], iota, K), axis=1
        ).astype(jnp.int32)
        stop = done | (mx <= 0.0)
        livef = (~stop).astype(X.dtype)
        selpen = selpen.at[rows, k].add(1e30 * livef)
        # zero atom on frozen lanes: their new slot is inert everywhere
        dk = jnp.take(Dt, k, axis=0) * livef[:, None]        # (N, p)
        a0k = jnp.sum(dk * Xt, axis=1)
        if t == 0:
            Gsel = jnp.sum(dk * dk, axis=1)[:, None, None]
            Dstack = dk[:, None, :]
        else:
            cross = jnp.einsum(
                "ntp,np->nt", Dstack, dk, precision=precision
            )                                                # (N, t)
            dkk = jnp.sum(dk * dk, axis=1)
            Gsel = jnp.concatenate(
                [
                    jnp.concatenate([Gsel, cross[:, :, None]], axis=2),
                    jnp.concatenate(
                        [cross[:, None, :], dkk[:, None, None]], axis=2
                    ),
                ],
                axis=1,
            )
            Dstack = jnp.concatenate([Dstack, dk[:, None, :]], axis=1)
        # contract: idx is 0-padded after stop (GreedyResult docstring)
        idx = jnp.concatenate(
            [idx, jnp.where(stop, 0, k)[:, None]], axis=1
        )
        a0sel = jnp.concatenate([a0sel, a0k[:, None]], axis=1)
        smask = jnp.concatenate([smask, livef[:, None]], axis=1)

        if t == 0:
            # 1-dim NNLS in closed form; a0k = mx > 0 on live lanes so
            # the nonnegativity clip never binds there
            new_gamma = jnp.maximum(
                a0sel / jnp.maximum(Gsel[:, :, 0], 1e-30), 0.0
            ) * smask
        else:
            pos = smask
            g = jnp.zeros_like(a0sel)
            for _ in range(nnls_rounds):
                g = masked_cg(Gsel, pos, a0sel * pos, t + 2)
                pos = pos * (g > 0)
            new_gamma = jnp.maximum(g, 0.0) * pos
        new_r = Xt - jnp.einsum(
            "nt,ntp->np", new_gamma, Dstack, precision=precision
        )
        gamma_prev = jnp.concatenate(
            [gamma, jnp.zeros((N, 1), X.dtype)], axis=1
        )
        gamma = jnp.where(stop[:, None], gamma_prev, new_gamma)
        r = jnp.where(stop[:, None], r, new_r)
        nsel = jnp.where(stop, nsel, nsel + 1)
        done = stop

    err = (
        xnormsq
        - 2 * jnp.sum(gamma * a0sel, axis=1)
        + jnp.einsum("nt,ntj,nj->n", gamma, Gsel, gamma)
    )
    return GreedyResult(idx=idx, gamma=gamma, err=err, nsel=nsel)


def nn_omp(
    D: jax.Array, X: jax.Array, T: int, *, nnls_rounds: int = 4,
    precision=_HI, dense: bool = True, unroll: bool | None = None,
):
    """Non-negative OMP (oracle.nn_omp): positive-correlation selection +
    bounded active-set NNLS per step (prune-only Lawson-Hanson:
    ``nnls_rounds`` solve/prune passes, no re-entry of pruned atoms — on
    coherent dictionaries a pruned atom that true Lawson-Hanson would
    restore stays out, so the per-step solution can be slightly
    suboptimal; measured 2e-13 vs the scipy NNLS oracle on the test
    problems).  Returns Gamma (K, N) >= 0.

    ``unroll=None`` auto-selects the unrolled-step implementation for
    small T (growing-dimension CG solves; ~1.7x on chip at the sweep
    shape) and the lax.scan form for larger T (bounded compile time).
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    if T == 0:
        # neither impl traces at T=0 (empty selected-atom axes); the
        # empty code is exact (ADVICE r2)
        N = X.shape[1]
        res = GreedyResult(
            idx=jnp.zeros((N, 0), jnp.int32),
            gamma=jnp.zeros((N, 0), X.dtype),
            err=jnp.sum(X * X, axis=0),
            nsel=jnp.zeros((N,), jnp.int32),
        )
        return res.dense(D.shape[1]) if dense else res
    if unroll is None:
        unroll = T <= 12
    impl = _nn_omp_impl_unrolled if unroll else _nn_omp_impl
    res = impl(D, X, T=T, nnls_rounds=nnls_rounds, precision=precision)
    return res.dense(D.shape[1]) if dense else res


@functools.partial(jax.jit, static_argnames=("kind",))
def threshold_code(
    D: jax.Array, X: jax.Array, lam: float, kind: str = "soft"
) -> jax.Array:
    """One-shot thresholding coder: Gamma = shrink(D^T X, lam) (oracle parity)."""
    A = jnp.matmul(D.T, X, precision=_HI)
    if kind == "soft":
        return jnp.sign(A) * jnp.maximum(jnp.abs(A) - lam, 0.0)
    return A * (jnp.abs(A) > lam)
