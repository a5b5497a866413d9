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
    # conds.  This value-state kernel therefore always unrolls all T
    # steps; eps-mode instead routes to _kernel_eps_exit below, whose
    # ref-resident state makes the statement-form pl.when early exit
    # expressible (r7: 2.7x the XLA scan on an eps workload).
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


def _kernel_eps_exit(x_ref, dt_ref, d_ref, gam_ref, idx_ref, aux_ref,
                     r_ref, l_ref, dsel_ref,
                     *, p, K, T, eps, corr_mode, dk_mode):
    """eps-mode variant with PER-BLOCK early exit: solver state lives in
    VMEM scratch refs and every pursuit step is wrapped in
    ``pl.when(~all_done)`` — once every lane of this grid block has
    converged, the remaining steps reduce to one scalar predicate check.

    Why refs: skipping a step must leave state untouched, which values
    threaded through Python control flow cannot express (a value-carrying
    ``lax.cond`` fails Mosaic legalization — CLAUDE.md measured limits);
    statement-form ``pl.when`` over ref side effects is the conditional
    that DOES lower.  A skipped step is bitwise-identical to the masked
    value kernel's all-lanes-frozen step (frozen lanes never change
    state), so this kernel's outputs equal ``_kernel``'s in eps mode.

    eps-stopped workloads are exactly where this pays: denoise patches
    mostly converge in 1-3 atoms and Pallas grid blocks are raster-
    contiguous (spatially coherent) patches, so most blocks exit after a
    few of the T unrolled steps instead of paying all of them.

    State layout (all lanes-last, rows addressed with static keepdim
    slices — the Mosaic-safe row access pattern from ops/pallas_patches):
      r_ref    (p, Nb)      residual
      l_ref    (T*T, Nb)    inverse-Cholesky rows, row i*T+j = Linv[i][j]
      dsel_ref (T*p, Nb)    selected atoms, rows [t*p, (t+1)*p)
      gam_ref  (T, Nb)      a0 rows during the loop, gamma rows at the end
      aux_ref rows: 0 = err, 1 = nsel, 2 = done (0/1 f32)
    """
    Nb = x_ref.shape[1]
    x = x_ref[...]
    DT = dt_ref[...]
    D = d_ref[...]
    if corr_mode == "split3":
        DTh, DTl = _bf16_split(DT)
    if dk_mode == "split3":
        Dh, Dm, Dl = _exact3_split(D)
    zero = jnp.zeros((1, Nb), jnp.float32)
    iota_k = lax.broadcasted_iota(jnp.int32, (K, Nb), 0)

    def corr_matmul(r):
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

    # prologue: zero-init everything the epilogue reads — a block that
    # exits at step s leaves rows > s UNWRITTEN (scratch VMEM is garbage)
    r_ref[...] = x
    l_ref[...] = jnp.zeros((T * T, Nb), jnp.float32)
    gam_ref[...] = jnp.zeros((T, Nb), jnp.float32)
    idx_ref[...] = jnp.zeros((T, Nb), jnp.int32)
    xnormsq = jnp.sum(x * x, axis=0, keepdims=True)
    aux_ref[0:1, :] = xnormsq
    aux_ref[1:2, :] = zero
    aux_ref[2:3, :] = (xnormsq <= eps * eps).astype(jnp.float32)
    aux_ref[3:8, :] = jnp.zeros((5, Nb), jnp.float32)

    def step(t):
        done = aux_ref[2:3, :] > 0.5
        r = r_ref[...]
        corr = corr_matmul(r)
        s = jnp.abs(corr)
        mx = jnp.max(s, axis=0, keepdims=True)
        k = jnp.min(jnp.where(s == mx, iota_k, K), axis=0, keepdims=True)

        if dk_mode == "split3":
            oh = (iota_k == k).astype(jnp.bfloat16)
            dk = (
                jnp.dot(Dh, oh, preferred_element_type=jnp.float32)
                + jnp.dot(Dm, oh, preferred_element_type=jnp.float32)
                + jnp.dot(Dl, oh, preferred_element_type=jnp.float32)
            )
        else:
            onehot = (iota_k == k).astype(jnp.float32)
            dk = jnp.dot(D, onehot, preferred_element_type=jnp.float32,
                         precision=_HI)

        dsel = [dsel_ref[j * p:(j + 1) * p, :] for j in range(t)]
        L = [[l_ref[i * T + j:i * T + j + 1, :] for j in range(t)]
             for i in range(t)]
        g = [jnp.sum(dsel[j] * dk, axis=0, keepdims=True)
             for j in range(t)]
        w = [sum((L[i][j] * g[j] for j in range(t)), zero)
             for i in range(t)]
        nu = 1.0 - sum((w[i] * w[i] for i in range(t)), zero)
        bad = nu <= 1e-6
        li = lax.rsqrt(jnp.maximum(nu, 1e-12))
        frozen = done | bad

        newrow = [
            -li * sum((w[i] * L[i][j] for i in range(t)), zero)
            for j in range(t)
        ]
        for j in range(t):
            l_ref[t * T + j:t * T + j + 1, :] = jnp.where(
                frozen, 0.0, newrow[j]
            )
        l_ref[t * T + t:t * T + t + 1, :] = jnp.where(frozen, 0.0, li)
        dsel_ref[t * p:(t + 1) * p, :] = jnp.where(frozen, 0.0, dk)
        a0_t = jnp.where(frozen, 0.0, jnp.sum(dk * x, axis=0,
                                              keepdims=True))
        gam_ref[t:t + 1, :] = a0_t
        idx_ref[t:t + 1, :] = jnp.where(frozen, 0, k)

        # solve gamma = L^T (L a0) from the rows INCLUDING this step's
        Lrow = L + [[jnp.where(frozen, 0.0, newrow[j]) for j in range(t)]
                    + [jnp.where(frozen, 0.0, li)]]
        a0 = [gam_ref[j:j + 1, :] for j in range(t + 1)]
        y = [sum((Lrow[i][j] * a0[j] for j in range(i + 1)), zero)
             for i in range(t + 1)]
        gamma = [sum((Lrow[i][j] * y[i] for i in range(j, t + 1)), zero)
                 for j in range(t + 1)]
        r_new = x
        for j in range(t):
            r_new = r_new - dsel[j] * gamma[j]
        r_new = r_new - jnp.where(frozen, 0.0, dk) * gamma[t]
        err_new = jnp.sum(r_new * r_new, axis=0, keepdims=True)

        err_old = aux_ref[0:1, :]
        err = jnp.where(frozen, err_old, err_new)
        r_ref[...] = jnp.where(frozen, r, r_new)
        aux_ref[0:1, :] = err
        aux_ref[1:2, :] = aux_ref[1:2, :] + jnp.where(frozen, 0.0, 1.0)
        done_new = frozen | (err <= eps * eps)
        aux_ref[2:3, :] = done_new.astype(jnp.float32)

    for t in range(T):
        alldone = jnp.min(aux_ref[2:3, :]) > 0.5

        @pl.when(jnp.logical_not(alldone))
        def _():
            step(t)

    # epilogue: final solve from retained state (runs unconditionally;
    # zero rows beyond each lane's nsel reproduce the last solve)
    L = [[l_ref[i * T + j:i * T + j + 1, :] for j in range(T)]
         for i in range(T)]
    a0 = [gam_ref[j:j + 1, :] for j in range(T)]
    y = [sum((L[i][j] * a0[j] for j in range(T)), zero) for i in range(T)]
    for j in range(T):
        gam_ref[j:j + 1, :] = sum(
            (L[i][j] * y[i] for i in range(T)), zero
        )


@functools.partial(
    jax.jit,
    static_argnames=("T", "eps", "eps_mode", "block", "corr_mode",
                     "dk_mode", "interpret", "eps_exit", "vmem_limit_mb"),
)
def omp_fused(
    D: jax.Array, X: jax.Array, *, T: int, eps: float = 0.0,
    eps_mode: bool = False, block: int = 512, corr_mode: str = "hi",
    dk_mode: str = "hi", interpret: bool = False, eps_exit: bool = True,
    vmem_limit_mb: int | None = None,
):
    """Fused OMP: returns (idx (N, T) i32, gamma (N, T), err (N,),
    nsel (N,)) with greedy.GreedyResult semantics.  N % block == 0.

    eps_mode routes to the per-block-early-exit ref-state kernel
    (``_kernel_eps_exit``): bitwise-identical outputs, but a grid block
    whose lanes have all converged skips its remaining pursuit steps —
    the dominant case for denoise-style workloads where most patches
    stop after 1-3 atoms.
    """
    p, K = D.shape
    N = X.shape[1]
    assert N % block == 0, (N, block)
    D = D.astype(jnp.float32)
    X = X.astype(jnp.float32)
    # huge-K regime: Mosaic's 16MB scoped-vmem default is a compiler
    # knob, not hardware (v5e VMEM = 128MB); callers raise it when the
    # K-proportional residency overflows the default (greedy.py ladder)
    compiler_params = (
        None if vmem_limit_mb is None else pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        )
    )

    in_specs = [
        pl.BlockSpec((p, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, p), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p, K), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((T, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, N), jnp.float32),
        jax.ShapeDtypeStruct((T, N), jnp.int32),
        jax.ShapeDtypeStruct((8, N), jnp.float32),
    )
    if eps_mode and eps_exit:
        gam, idx, aux = pl.pallas_call(
            functools.partial(
                _kernel_eps_exit, p=p, K=K, T=T, eps=float(eps),
                corr_mode=corr_mode, dk_mode=dk_mode,
            ),
            grid=(N // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((p, block), jnp.float32),         # residual
                pltpu.VMEM((T * T, block), jnp.float32),     # Linv rows
                pltpu.VMEM((T * p, block), jnp.float32),     # Dsel rows
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(X, D.T, D)
    else:
        gam, idx, aux = pl.pallas_call(
            functools.partial(
                _kernel, p=p, K=K, T=T, eps=float(eps), eps_mode=eps_mode,
                corr_mode=corr_mode, dk_mode=dk_mode,
            ),
            grid=(N // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=compiler_params,
            interpret=interpret,
        )(X, D.T, D)
    return (
        idx.T, gam.T, aux[0], aux[1].astype(jnp.int32),
    )
