"""Full-fused OMP solver kernel: all T pursuit steps in one Pallas program
per lane block, solver state resident in VMEM/registers.

Why (profiled, benchmarks/results/profile_bomp_notes.md): the XLA scan
solver is memory/latency bound — per step it writes + twice reads the
(N, K) correlation array and streams the (N, T, p) selected-atom state
through HBM, for ~2.56 ms/step against a ~0.3 ms MXU floor.  Piecewise
fusion (a corr+argmax kernel inside the scan) measured SLOWER end to end
because the custom call breaks XLA's step fusion.  The only design that
collapses the traffic is the whole solver in one kernel: HBM sees X once
in and (idx, gamma, err) once out.

Dataflow per grid program (one block of Nb lanes):

    x (p, Nb) -> r
    repeat t = 0..T-1 (statically unrolled):
      corr  = D^T r                 MXU (K, p) x (p, Nb)
      k     = argmin-tie argmax |corr|          (1, Nb), sublane reduce
      onehot= (iota_K == k)                     (K, Nb)
      dk    = D @ onehot            MXU (p, K) x (K, Nb)  [gather-free]
      progressive inverse-Cholesky append + solve: the (T, T) per-lane
      factor is held as T*T separate (1, Nb) row vectors (plain values,
      unrolled), so every small contraction is a chain of full-tile FMAs
      r     = x - sum_t gamma_t Dsel_t          (p, Nb)
      freeze lanes: eps reached / breakdown / already done

Lanes-last layout throughout, and NO value is ever assembled across
sublane offsets — Mosaic rejects relayouts between replicated-sublane
(1, Nb) vectors and (T, Nb) tiles, so the per-lane T-vectors (g, w, y,
gamma, a0sel) and the T x T factor stay as Python lists of (1, Nb) rows
for the whole unrolled solve.

Semantics match solvers.greedy._omp_impl exactly (same selection
tie-break, same freeze rules); parity is tested in interpreter mode and
on chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = lax.Precision.HIGHEST


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _exact3_split(a):
    """Exact 3-way bf16 decomposition of f32: a == hi + mid + lo BITWISE.

    Each subtraction is exact in f32 (the leading bits cancel), and the
    final residual carries <= 8 significant bits, which bf16 represents
    exactly (bf16 shares f32's exponent range, so no underflow).  Verified
    bit-exact on chip (tests/test_pallas_omp.py::test_dk_split3_bit_exact).

    Magnitude precondition: the residual terms drop ~8 bits of exponent
    each, so entries below ~2^-110 can land `lo` in bf16's subnormal floor
    (2^-133) and silently break the bitwise guarantee.  Unit-norm atoms
    satisfy this by orders of magnitude (a (p<=512)-dim unit vector has
    entries >= 2^-127 only if essentially zero, and exact zeros split
    exactly); callers feeding non-normalized dictionaries with ~1e-35
    entries should use dk_mode='hi'.
    """
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _kernel(x_ref, dt_ref, d_ref, gam_ref, idx_ref, aux_ref,
            *, p, K, T, eps, eps_mode, corr_mode, dk_mode):
    Nb = x_ref.shape[1]
    x = x_ref[...]                                    # (p, Nb)
    DT = dt_ref[...]                                  # (K, p)
    D = d_ref[...]                                    # (p, K)
    if corr_mode == "split3":
        DTh, DTl = _bf16_split(DT)
    if dk_mode == "split3":
        Dh, Dm, Dl = _exact3_split(D)

    def corr_matmul(r):
        """Selection-only correlation D^T r.  'split3' is a manual 3-pass
        bf16 decomposition (hi*hi + hi*lo + lo*hi, f32 accumulation,
        ~2^-22-faithful): +17% throughput at block=512, but on chip it
        flips the pick on ~1e-4 of lanes — and on 2 of the 3 flipped
        lanes in a 32k A/B the 6-pass choice matched the fp64 oracle
        while split3 did not.  Fidelity is the product bar, so 'hi'
        (6-pass HIGHEST, oracle-exact on every lane tested) stays the
        default; 'split3' and 'fast' (1-pass bf16) are opt-in."""
        if corr_mode == "hi":
            return jnp.dot(DT, r, preferred_element_type=jnp.float32,
                           precision=_HI)
        if corr_mode == "split3":
            rh, rl = _bf16_split(r)
            return (
                jnp.dot(DTh, rh, preferred_element_type=jnp.float32)
                + jnp.dot(DTh, rl, preferred_element_type=jnp.float32)
                + jnp.dot(DTl, rh, preferred_element_type=jnp.float32)
            )
        return jnp.dot(DT, r, preferred_element_type=jnp.float32)

    zero = jnp.zeros((1, Nb), jnp.float32)

    xnormsq = jnp.sum(x * x, axis=0, keepdims=True)   # (1, Nb)
    done0 = jnp.zeros((1, Nb), jnp.bool_)
    if eps_mode:
        done0 = xnormsq <= eps * eps
    iota_k = lax.broadcasted_iota(jnp.int32, (K, Nb), 0)

    # per-lane solver state as unrolled (1, Nb) rows, carried as one
    # pytree so eps-mode can skip whole steps via lax.cond
    state = (
        x,                                            # r
        xnormsq,                                      # err
        done0,
        zero,                                         # nsel
        tuple(tuple(zero for _ in range(T)) for _ in range(T)),  # Linv
        tuple(zero for _ in range(T)),                # a0
        tuple(jnp.zeros((p, Nb), jnp.float32) for _ in range(T)),  # dsel
        tuple(jnp.zeros((1, Nb), jnp.int32) for _ in range(T)),   # kidx
    )

    def step(st, t):
        r, err, done, nsel, Lt, a0t, dselt, kidxt = st
        L = [list(row) for row in Lt]
        a0, dsel, kidx = list(a0t), list(dselt), list(kidxt)
        stop = done

        # --- selection: argmax |D^T r| with min-index tie-break
        corr = corr_matmul(r)
        s = jnp.abs(corr)
        mx = jnp.max(s, axis=0, keepdims=True)        # (1, Nb)
        k = jnp.min(jnp.where(s == mx, iota_k, K), axis=0, keepdims=True)

        # --- gather-free atom fetch: one-hot column selection on the MXU.
        # dk_mode='hi': HIGHEST (6 bf16 passes) reproduces the f32 column
        # bit-exactly.  dk_mode='split3': exact 3-way bf16 split of D —
        # one-hot products and the f32 additions are all exact, so this is
        # ALSO bitwise identical to the gather at half the MXU passes
        # (the r2 'Dekker 3-split' used a 2-term split and lost bits; the
        # 3-term split above is lossless).
        if dk_mode == "split3":
            oh = (iota_k == k).astype(jnp.bfloat16)   # (K, Nb), exact 0/1
            dk = (
                jnp.dot(Dh, oh, preferred_element_type=jnp.float32)
                + jnp.dot(Dm, oh, preferred_element_type=jnp.float32)
                + jnp.dot(Dl, oh, preferred_element_type=jnp.float32)
            )                                         # (p, Nb)
        else:
            onehot = (iota_k == k).astype(jnp.float32)  # (K, Nb)
            dk = jnp.dot(D, onehot, preferred_element_type=jnp.float32,
                         precision=_HI)               # (p, Nb)

        # --- progressive inverse-Cholesky append (lanes-last, unrolled):
        # g = Dsel . dk;  w = L g;  nu = 1 - ||w||^2;
        # new row = [-linv (L^T w) | linv]
        g = [jnp.sum(dsel[j] * dk, axis=0, keepdims=True)
             for j in range(t)]
        w = [sum((L[i][j] * g[j] for j in range(t)), zero)
             for i in range(t)]
        nu = 1.0 - sum((w[i] * w[i] for i in range(t)), zero)
        bad = nu <= 1e-6
        li = lax.rsqrt(jnp.maximum(nu, 1e-12))        # (1, Nb)
        frozen = stop | bad

        newrow = [
            -li * sum((w[i] * L[i][j] for i in range(t)), zero)
            for j in range(t)
        ]
        for j in range(t):
            L[t][j] = jnp.where(frozen, 0.0, newrow[j])
        L[t][t] = jnp.where(frozen, 0.0, li)

        dsel[t] = jnp.where(frozen, 0.0, dk)
        a0[t] = jnp.where(
            frozen, 0.0, jnp.sum(dk * x, axis=0, keepdims=True)
        )
        kidx[t] = jnp.where(frozen, 0, k)

        # --- solve gamma = L^T (L a0) and refresh the residual
        y = [sum((L[i][j] * a0[j] for j in range(t + 1)), zero)
             for i in range(t + 1)]
        gamma = [sum((L[i][j] * y[i] for i in range(t + 1)), zero)
                 for j in range(t + 1)]
        r_new = x
        for j in range(t + 1):
            r_new = r_new - dsel[j] * gamma[j]
        err_new = jnp.sum(r_new * r_new, axis=0, keepdims=True)
        r = jnp.where(frozen, r, r_new)
        err = jnp.where(frozen, err, err_new)
        nsel = jnp.where(frozen, nsel, nsel + 1.0)
        done = frozen
        if eps_mode:
            done = done | (err <= eps * eps)
        return (r, err, done, nsel,
                tuple(tuple(row) for row in L), tuple(a0), tuple(dsel),
                tuple(kidx))

    # NOTE: whole-block early exit via lax.cond(all(done)) does NOT lower
    # — Mosaic "failed to legalize operation 'scf.if'" for value-carrying
    # conds (pl.when is statement-form only).  eps-mode therefore always
    # unrolls all T steps here; the XLA scan solver keeps its global
    # early exit and stays the default route for eps-mode workloads
    # (solvers.greedy._fused_supported).
    for t in range(T):
        state = step(state, t)

    _, err, _, nsel, Lt, a0t, _, kidxt = state
    L = [list(row) for row in Lt]
    a0, kidx = list(a0t), list(kidxt)

    # final solve from the retained state: frozen lanes' later rows are
    # zero, so their gamma rows beyond nsel vanish and earlier rows
    # reproduce their last solve — _omp_impl's valid-masked output
    y = [sum((L[i][j] * a0[j] for j in range(T)), zero) for i in range(T)]
    for j in range(T):
        gam_ref[j : j + 1, :] = sum(
            (L[i][j] * y[i] for i in range(T)), zero
        )
        idx_ref[j : j + 1, :] = kidx[j]
    aux_ref[0:1, :] = err
    aux_ref[1:2, :] = nsel
    aux_ref[2:8, :] = jnp.zeros((6, Nb), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("T", "eps", "eps_mode", "block", "corr_mode",
                     "dk_mode", "interpret"),
)
def omp_fused(
    D: jax.Array, X: jax.Array, *, T: int, eps: float = 0.0,
    eps_mode: bool = False, block: int = 512, corr_mode: str = "hi",
    dk_mode: str = "hi", interpret: bool = False,
):
    """Fused OMP: returns (idx (N, T) i32, gamma (N, T), err (N,),
    nsel (N,)) with greedy.GreedyResult semantics.  N % block == 0."""
    p, K = D.shape
    N = X.shape[1]
    assert N % block == 0, (N, block)
    D = D.astype(jnp.float32)
    X = X.astype(jnp.float32)

    gam, idx, aux = pl.pallas_call(
        functools.partial(
            _kernel, p=p, K=K, T=T, eps=float(eps), eps_mode=eps_mode,
            corr_mode=corr_mode, dk_mode=dk_mode,
        ),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((p, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, N), jnp.float32),
            jax.ShapeDtypeStruct((T, N), jnp.int32),
            jax.ShapeDtypeStruct((8, N), jnp.float32),
        ),
        interpret=interpret,
    )(X, D.T, D)
    return (
        idx.T, gam.T, aux[0], aux[1].astype(jnp.int32),
    )
