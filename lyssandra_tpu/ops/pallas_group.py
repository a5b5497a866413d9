"""Full-fused group-OMP kernel: all T group-selection steps in one Pallas
program per lane block (the ops/pallas_omp.py design generalized to
gs-wide block-Cholesky appends).

Why: the XLA scan solver runs ~320k patches/s at (K=1024, gs=4, T=4,
N=32k) — the same per-step HBM traffic wall the plain-OMP scan had
before its kernel (state streamed through HBM every step).  Fusing keeps
the whole solve in VMEM: HBM sees x once in and (group ids, gamma, err)
once out.  Measured through the public route: 1.42x the XLA
scan (benchmarks/ab_group_fused.py; ``_kernel_packed`` below, the r9
default, is 1.65x).  The win is smaller than plain OMP's
(3.4x) because this kernel is VPU-ISSUE bound, not traffic bound: the
block-Cholesky append/solve unrolls ~3000 (1, Nb) row ops per step
(each using 1 of 8 sublanes) vs plain OMP's ~64 — block=256 beats 512+
for that reason.

Layout tricks (beyond the pallas_omp ones):
- Atoms are PERMUTED host-side so every group is a contiguous run of
  ``gs`` columns (padded with zero atoms).  Slot s of all groups is then
  the strided column set s::gs, which the host passes as gs separate
  (p, ng) matrices — so the per-step member fetch is gs one-hot matmuls
  of (p, ng) x (ng, Nb), TOTALLING the cost of ONE full (p, K) fetch,
  and the group scores are sum_s corr_s^2 over gs slot-correlations
  (ng, Nb) — no (K, Nb) array and no cross-sublane reshape anywhere.
- The progressive inverse-Cholesky factor over A = T*gs slots, the
  gs x gs Schur complement, its unrolled Cholesky inverse, and all
  per-lane solves stay Python lists of (1, Nb) rows (Mosaic's
  no-relayout rule, see pallas_omp).

Semantic deltas vs solvers.greedy._group_omp_impl (tolerance-tested):
the XLA path retries a failed block factorization with an escalated
ridge; the kernel freezes the lane instead (same as plain OMP's
dependent-atom breakdown).  Parity on non-degenerate problems is pinned
by tests; degenerate lanes keep their pre-breakdown (valid) solution.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = lax.Precision.HIGHEST


def _kernel(x_ref, dst_ref, ds_ref, gam_ref, gidx_ref, aux_ref,
            *, p, ng, gs, T):
    Nb = x_ref.shape[1]
    A = T * gs
    x = x_ref[...]                                    # (p, Nb)
    zero = jnp.zeros((1, Nb), jnp.float32)
    iota_g = lax.broadcasted_iota(jnp.int32, (ng, Nb), 0)

    # slot matrices: DsT[s] (ng, p) rows of dst_ref; Ds[s] (p, ng)
    DsT = [dst_ref[s * ng : (s + 1) * ng, :] for s in range(gs)]
    Ds = [ds_ref[s * p : (s + 1) * p, :] for s in range(gs)]
    # per-slot validity row (1, ng) is encoded by the zero columns of Ds
    # themselves: invalid members are zero atoms -> zero corr, zero dnew

    xnormsq = jnp.sum(x * x, axis=0, keepdims=True)

    # state
    r = x
    err = xnormsq
    done = jnp.zeros((1, Nb), jnp.bool_)
    nsel = zero
    gsel = jnp.zeros((ng, Nb), jnp.bool_)
    L = [[zero] * A for _ in range(A)]
    a0 = [zero] * A
    dsel = [jnp.zeros((p, Nb), jnp.float32) for _ in range(A)]
    gidx = [jnp.zeros((1, Nb), jnp.int32) for _ in range(T)]
    valid = [zero] * A                                # 1.0 on real members

    for t in range(T):
        stop = done

        # --- selection: argmax_g sum_s (d_{g,s} . r)^2, skip selected
        corr_s = [
            jnp.dot(DsT[s], r, preferred_element_type=jnp.float32,
                    precision=_HI)
            for s in range(gs)
        ]                                             # gs x (ng, Nb)
        score = sum(c * c for c in corr_s)            # (ng, Nb)
        score = score - 1e30 * gsel.astype(jnp.float32)
        mx = jnp.max(score, axis=0, keepdims=True)
        g = jnp.min(jnp.where(score == mx, iota_g, ng), axis=0,
                    keepdims=True)                    # (1, Nb)
        onehot = (iota_g == g)                        # (ng, Nb) bool
        gsel = gsel | (onehot & ~stop)

        # --- member fetch: gs one-hot matmuls on the slot matrices
        ohf = onehot.astype(jnp.float32)
        dnew = [
            jnp.dot(Ds[s], ohf, preferred_element_type=jnp.float32,
                    precision=_HI)
            for s in range(gs)
        ]                                             # gs x (p, Nb)
        vnew = [
            jnp.sum(dnew[s] * dnew[s], axis=0, keepdims=True) > 1e-12
            for s in range(gs)
        ]                                             # real member?
        vnewf = [v.astype(jnp.float32) for v in vnew]

        # --- block append to the inverse Cholesky factor
        base = t * gs
        # g_cross[j][s] = dsel[j] . dnew[s]
        g_cross = [
            [jnp.sum(dsel[j] * dnew[s], axis=0, keepdims=True)
             for s in range(gs)]
            for j in range(base)
        ]
        # W[i][s] = sum_j L[i][j] g_cross[j][s]
        W = [
            [sum((L[i][j] * g_cross[j][s] for j in range(base)), zero)
             for s in range(gs)]
            for i in range(base)
        ]
        # Schur = Gnn - W^T W  (+ identity rows for padded members)
        Schur = [[None] * gs for _ in range(gs)]
        for s1 in range(gs):
            for s2 in range(gs):
                gnn = jnp.sum(dnew[s1] * dnew[s2], axis=0, keepdims=True)
                if s1 == s2:
                    gnn = gnn + (1.0 - vnewf[s1])
                Schur[s1][s2] = gnn - sum(
                    (W[i][s1] * W[i][s2] for i in range(base)), zero
                )
        # unrolled Cholesky of the gs x gs block + positivity check
        Lb = [[zero] * gs for _ in range(gs)]
        ok = None
        for i in range(gs):
            s_ = Schur[i][i] + 1e-9
            for k2 in range(i):
                s_ = s_ - Lb[i][k2] * Lb[i][k2]
            oki = s_ > 1e-8
            ok = oki if ok is None else (ok & oki)
            dii = jnp.sqrt(jnp.maximum(s_, 1e-12))
            Lb[i][i] = dii
            inv_dii = 1.0 / dii
            for j2 in range(i + 1, gs):
                s2_ = Schur[j2][i]
                for k2 in range(i):
                    s2_ = s2_ - Lb[j2][k2] * Lb[i][k2]
                Lb[j2][i] = s2_ * inv_dii
        bad = ~ok
        frozen = stop | bad
        # inverse of the lower-triangular block
        Lbinv = [[zero] * gs for _ in range(gs)]
        for j2 in range(gs):
            for i in range(j2, gs):
                acc = sum(
                    (-Lb[i][k2] * Lbinv[k2][j2] for k2 in range(j2, i)),
                    zero,
                )
                if i == j2:
                    acc = acc + 1.0
                Lbinv[i][j2] = acc / Lb[i][i]

        # new rows: [-Lbinv W^T L | Lbinv]
        # V[s][i] = sum_{s'} Lbinv[s][s'] W[i][s']
        V = [
            [sum((Lbinv[s][s2] * W[i][s2] for s2 in range(s + 1)), zero)
             for i in range(base)]
            for s in range(gs)
        ]
        for s in range(gs):
            for j in range(base):
                L[base + s][j] = jnp.where(
                    frozen, 0.0,
                    -sum((V[s][i] * L[i][j] for i in range(base)), zero),
                )
            for s2 in range(gs):
                L[base + s][base + s2] = jnp.where(
                    frozen, 0.0, Lbinv[s][s2] if s2 <= s else zero
                )

        for s in range(gs):
            dsel[base + s] = jnp.where(frozen, 0.0, dnew[s])
            a0[base + s] = jnp.where(
                frozen, 0.0,
                jnp.sum(dnew[s] * x, axis=0, keepdims=True),
            )
            valid[base + s] = jnp.where(frozen, 0.0, vnewf[s])
        gidx[t] = jnp.where(frozen, gidx[t], g)

        # --- solve + 2 refinement rounds (matches the XLA path)
        hi = base + gs

        def solve(rhs):
            y = [sum((L[i][j] * rhs[j] for j in range(hi)), zero)
                 for i in range(hi)]
            return [sum((L[i][j] * y[i] for i in range(hi)), zero)
                    for j in range(hi)]

        gamma = solve(a0[:hi])
        for _ in range(2):
            r_new = x
            for j in range(hi):
                r_new = r_new - dsel[j] * gamma[j]
            resid_proj = [
                jnp.sum(dsel[j] * r_new, axis=0, keepdims=True)
                for j in range(hi)
            ]
            delta = solve(resid_proj)
            gamma = [gamma[j] + delta[j] for j in range(hi)]
        r_new = x
        for j in range(hi):
            r_new = r_new - dsel[j] * gamma[j]
        err_new = jnp.sum(r_new * r_new, axis=0, keepdims=True)

        r = jnp.where(frozen, r, r_new)
        err = jnp.where(frozen, err, err_new)
        nsel = jnp.where(frozen, nsel, nsel + 1.0)
        done = frozen

    # frozen lanes: rows beyond their last good step are zero, so the
    # final solve reproduces their retained solution (pallas_omp rule)
    y = [sum((L[i][j] * a0[j] for j in range(A)), zero) for i in range(A)]
    gamma_out = [sum((L[i][j] * y[i] for i in range(A)), zero)
                 for j in range(A)]
    # one refinement pass on the retained state (cheap, matches above
    # within fp noise for non-frozen lanes)
    for _ in range(2):
        r_f = x
        for j in range(A):
            r_f = r_f - dsel[j] * gamma_out[j]
        rp = [jnp.sum(dsel[j] * r_f, axis=0, keepdims=True)
              for j in range(A)]
        y = [sum((L[i][j] * rp[j] for j in range(A)), zero)
             for i in range(A)]
        delta = [sum((L[i][j] * y[i] for i in range(A)), zero)
                 for j in range(A)]
        gamma_out = [gamma_out[j] + delta[j] for j in range(A)]
    r_f = x
    for j in range(A):
        r_f = r_f - dsel[j] * gamma_out[j]

    for j in range(A):
        gam_ref[j : j + 1, :] = gamma_out[j] * valid[j]
    for t in range(T):
        gidx_ref[t : t + 1, :] = gidx[t]
    aux_ref[0:1, :] = jnp.sum(r_f * r_f, axis=0, keepdims=True)
    aux_ref[1:2, :] = nsel
    aux_ref[2:8, :] = jnp.zeros((6, Nb), jnp.float32)


def _kernel_packed(x_ref, dst_ref, ds_ref, gam_ref, gidx_ref, aux_ref,
                   lc_ref, lr_ref, w_ref, st_ref,
                   *, p, ng, gs, T):
    """Sublane-packed variant (VERDICT r2 task #8 experiment).

    The plain kernel is VPU-ISSUE bound: ~3000 single-sublane (1, Nb)
    row madds per late step (factor maintenance + 3 triangular solve
    pairs), each using 1 of 8 sublanes.  This variant keeps the inverse
    factor in TWO VMEM scratch packings —
      lc_ref (A*Ap, Nb): column j of Linv as an (Ap, Nb) tile at rows
                         [j*Ap, (j+1)*Ap) (entry i in sublane i);
      lr_ref (A*Ap, Nb): row i of Linv as an (Ap, Nb) tile (entry j in
                         sublane j)
    — so the solves become per-column/per-row TILE madds
    ((Ap, Nb) * (1, Nb) broadcasting is Mosaic-legal; explicit
    (1, Nb)->(Ap, Nb) relayout is NOT, which is why rows are re-read
    from refs with keepdim slices instead of extracted from values).
    W is packed the same way ((Ap, Nb) per slot in w_ref) and the Schur
    products collapse to axis-0 keepdim reductions.  Zero-init of the
    factor scratch makes the unwritten upper triangle/future rows
    contribute exact zeros, so full-tile sums equal the triangular
    sums.  Outputs match ``_kernel`` up to fp reassociation.
    """
    Nb = x_ref.shape[1]
    A = T * gs
    Ap = -(-A // 8) * 8
    x = x_ref[...]
    zero = jnp.zeros((1, Nb), jnp.float32)
    ztile = jnp.zeros((Ap, Nb), jnp.float32)
    iota_g = lax.broadcasted_iota(jnp.int32, (ng, Nb), 0)

    DsT = [dst_ref[s * ng : (s + 1) * ng, :] for s in range(gs)]
    Ds = [ds_ref[s * p : (s + 1) * p, :] for s in range(gs)]

    xnormsq = jnp.sum(x * x, axis=0, keepdims=True)

    # zero-init the packed factor (grid blocks reuse scratch VMEM)
    lc_ref[...] = jnp.zeros((A * Ap, Nb), jnp.float32)
    lr_ref[...] = jnp.zeros((A * Ap, Nb), jnp.float32)

    def lc(j):
        return lc_ref[j * Ap : (j + 1) * Ap, :]

    def lr(i):
        return lr_ref[i * Ap : (i + 1) * Ap, :]

    def solve_packed(rhs_rows, hi):
        """rhs_rows: list of hi (1, Nb) values.  Returns hi rows of
        Linv^T Linv rhs, via two packed half-solves staged through
        st_ref (values can't be row-sliced; refs can)."""
        y = ztile
        for j in range(hi):
            y = y + lc(j) * rhs_rows[j]
        st_ref[...] = y
        g = ztile
        for i in range(hi):
            g = g + lr(i) * st_ref[i : i + 1, :]
        st_ref[...] = g
        return [st_ref[j : j + 1, :] for j in range(hi)]

    r = x
    err = xnormsq
    done = jnp.zeros((1, Nb), jnp.bool_)
    nsel = zero
    gsel = jnp.zeros((ng, Nb), jnp.bool_)
    a0 = [zero] * A
    dsel = [jnp.zeros((p, Nb), jnp.float32) for _ in range(A)]
    gidx = [jnp.zeros((1, Nb), jnp.int32) for _ in range(T)]
    valid = [zero] * A

    for t in range(T):
        stop = done

        corr_s = [
            jnp.dot(DsT[s], r, preferred_element_type=jnp.float32,
                    precision=_HI)
            for s in range(gs)
        ]
        score = sum(c * c for c in corr_s)
        score = score - 1e30 * gsel.astype(jnp.float32)
        mx = jnp.max(score, axis=0, keepdims=True)
        g = jnp.min(jnp.where(score == mx, iota_g, ng), axis=0,
                    keepdims=True)
        onehot = (iota_g == g)
        gsel = gsel | (onehot & ~stop)

        ohf = onehot.astype(jnp.float32)
        dnew = [
            jnp.dot(Ds[s], ohf, preferred_element_type=jnp.float32,
                    precision=_HI)
            for s in range(gs)
        ]
        vnew = [
            jnp.sum(dnew[s] * dnew[s], axis=0, keepdims=True) > 1e-12
            for s in range(gs)
        ]
        vnewf = [v.astype(jnp.float32) for v in vnew]

        base = t * gs
        # cross-correlations with already-selected atoms (full-width
        # reductions, unchanged) ...
        g_cross = [
            [jnp.sum(dsel[j] * dnew[s], axis=0, keepdims=True)
             for s in range(gs)]
            for j in range(base)
        ]
        # ... but W = Linv G_cross is packed: one tile madd per (j, s)
        W = []
        for s in range(gs):
            w = ztile
            for j in range(base):
                w = w + lc(j) * g_cross[j][s]
            W.append(w)
            w_ref[s * Ap : (s + 1) * Ap, :] = w
        # Schur = Gnn - W^T W via axis-0 keepdim reductions (rows of W
        # beyond base are exact zeros)
        Schur = [[None] * gs for _ in range(gs)]
        for s1 in range(gs):
            for s2 in range(s1 + 1):
                gnn = jnp.sum(dnew[s1] * dnew[s2], axis=0, keepdims=True)
                if s1 == s2:
                    gnn = gnn + (1.0 - vnewf[s1])
                sc = gnn - jnp.sum(W[s1] * W[s2], axis=0, keepdims=True)
                Schur[s1][s2] = sc
                Schur[s2][s1] = sc
        # unrolled gs x gs Cholesky + inverse (tiny, stays single-row)
        Lb = [[zero] * gs for _ in range(gs)]
        ok = None
        for i in range(gs):
            s_ = Schur[i][i] + 1e-9
            for k2 in range(i):
                s_ = s_ - Lb[i][k2] * Lb[i][k2]
            oki = s_ > 1e-8
            ok = oki if ok is None else (ok & oki)
            dii = jnp.sqrt(jnp.maximum(s_, 1e-12))
            Lb[i][i] = dii
            inv_dii = 1.0 / dii
            for j2 in range(i + 1, gs):
                s2_ = Schur[j2][i]
                for k2 in range(i):
                    s2_ = s2_ - Lb[j2][k2] * Lb[i][k2]
                Lb[j2][i] = s2_ * inv_dii
        bad = ~ok
        frozen = stop | bad
        frozf = frozen.astype(jnp.float32)
        keep = 1.0 - frozf
        Lbinv = [[zero] * gs for _ in range(gs)]
        for j2 in range(gs):
            for i in range(j2, gs):
                acc = sum(
                    (-Lb[i][k2] * Lbinv[k2][j2] for k2 in range(j2, i)),
                    zero,
                )
                if i == j2:
                    acc = acc + 1.0
                Lbinv[i][j2] = acc / Lb[i][i]

        # new factor rows, packed over j: row(base+s) = -sum_i V[s][i] *
        # Lrow[i], with V[s] = Lbinv[s][:] W^T re-read per-row from w_ref
        for s in range(gs):
            newrow = ztile
            for i in range(base):
                vsi = zero
                for s2 in range(s + 1):
                    vsi = vsi + Lbinv[s][s2] * w_ref[
                        s2 * Ap + i : s2 * Ap + i + 1, :
                    ]
                newrow = newrow - lr(i) * vsi
            newrow = newrow * keep
            lr_ref[(base + s) * Ap : (base + s + 1) * Ap, :] = newrow
            # diagonal-block entries into the packed row ...
            for s2 in range(s + 1):
                lr_ref[
                    (base + s) * Ap + base + s2
                    : (base + s) * Ap + base + s2 + 1, :
                ] = Lbinv[s][s2] * keep
            # ... and scatter the whole row into the column packing
            for j in range(base + s + 1):
                lc_ref[j * Ap + base + s : j * Ap + base + s + 1, :] = (
                    lr_ref[(base + s) * Ap + j : (base + s) * Ap + j + 1, :]
                )

        for s in range(gs):
            dsel[base + s] = jnp.where(frozen, 0.0, dnew[s])
            a0[base + s] = jnp.where(
                frozen, 0.0,
                jnp.sum(dnew[s] * x, axis=0, keepdims=True),
            )
            valid[base + s] = jnp.where(frozen, 0.0, vnewf[s])
        gidx[t] = jnp.where(frozen, gidx[t], g)

        hi = base + gs
        gamma = solve_packed(a0[:hi], hi)
        gamma = [jnp.asarray(gr) for gr in gamma]  # materialize rows
        for _ in range(2):
            r_new = x
            for j in range(hi):
                r_new = r_new - dsel[j] * gamma[j]
            resid_proj = [
                jnp.sum(dsel[j] * r_new, axis=0, keepdims=True)
                for j in range(hi)
            ]
            delta = solve_packed(resid_proj, hi)
            gamma = [gamma[j] + delta[j] for j in range(hi)]
        r_new = x
        for j in range(hi):
            r_new = r_new - dsel[j] * gamma[j]
        err_new = jnp.sum(r_new * r_new, axis=0, keepdims=True)

        r = jnp.where(frozen, r, r_new)
        err = jnp.where(frozen, err, err_new)
        nsel = jnp.where(frozen, nsel, nsel + 1.0)
        done = frozen

    gamma_out = solve_packed(a0, A)
    gamma_out = [jnp.asarray(gr) for gr in gamma_out]
    for _ in range(2):
        r_f = x
        for j in range(A):
            r_f = r_f - dsel[j] * gamma_out[j]
        rp = [jnp.sum(dsel[j] * r_f, axis=0, keepdims=True)
              for j in range(A)]
        delta = solve_packed(rp, A)
        gamma_out = [gamma_out[j] + delta[j] for j in range(A)]
    r_f = x
    for j in range(A):
        r_f = r_f - dsel[j] * gamma_out[j]

    for j in range(A):
        gam_ref[j : j + 1, :] = gamma_out[j] * valid[j]
    for t in range(T):
        gidx_ref[t : t + 1, :] = gidx[t]
    aux_ref[0:1, :] = jnp.sum(r_f * r_f, axis=0, keepdims=True)
    aux_ref[1:2, :] = nsel
    aux_ref[2:8, :] = jnp.zeros((6, Nb), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("ng", "gs", "T", "block", "interpret", "packed"),
)
def _group_fused_call(X, DsT, Ds, *, ng, gs, T, block, interpret=False,
                      packed=False):
    p = X.shape[0]
    N = X.shape[1]
    in_specs = [
        pl.BlockSpec((p, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gs * ng, p), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gs * p, ng), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((T * gs, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((T * gs, N), jnp.float32),
        jax.ShapeDtypeStruct((T, N), jnp.int32),
        jax.ShapeDtypeStruct((8, N), jnp.float32),
    )
    if packed:
        A = T * gs
        Ap = -(-A // 8) * 8
        gam, gidx, aux = pl.pallas_call(
            functools.partial(_kernel_packed, p=p, ng=ng, gs=gs, T=T),
            grid=(N // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((A * Ap, block), jnp.float32),   # Linv cols
                pltpu.VMEM((A * Ap, block), jnp.float32),   # Linv rows
                pltpu.VMEM((gs * Ap, block), jnp.float32),  # packed W
                pltpu.VMEM((Ap, block), jnp.float32),       # solve stage
            ],
            interpret=interpret,
        )(X, DsT, Ds)
    else:
        gam, gidx, aux = pl.pallas_call(
            functools.partial(_kernel, p=p, ng=ng, gs=gs, T=T),
            grid=(N // block,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(X, DsT, Ds)
    return gam, gidx, aux


def group_omp_fused_supported(p, ng, gs, T, backend=None) -> bool:
    import jax as _jax

    backend = backend or _jax.default_backend()
    return (
        backend == "tpu"
        and p <= 512
        and T * gs <= 32          # unrolled factor rows stay tractable
        and gs <= 8
    )


def group_omp_fused(
    D, X, groups, T: int, *, block: int = 256, interpret: bool = False,
    packed: bool = False,
):
    """Fused group OMP.  Returns (idx (N, T*gs) ORIGINAL atom ids, gamma
    (N, T*gs), err (N,), nsel (N,), group ids (N, T)).  Wrapper pads
    lanes to the block, permutes atoms to contiguous (padded) groups,
    and maps slot indices back to original atom numbering."""
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    p0, K = D.shape
    N = X.shape[1]
    groups_np = np.asarray(groups, np.int64)
    ng = int(groups_np.max()) + 1
    gs = int(np.bincount(groups_np, minlength=ng).max())

    # contiguous-group slot map (static tiny numpy; the atom DATA never
    # leaves the device — np.asarray(D) here would be a device->host
    # fetch + re-upload on EVERY call, measured 2x end-to-end)
    slot_atom = np.zeros((ng, gs), np.int64)      # original atom id
    slot_valid = np.zeros((ng, gs), bool)
    for g in range(ng):
        mem = np.where(groups_np == g)[0]
        slot_atom[g, : len(mem)] = mem
        slot_valid[g, : len(mem)] = True

    pp = -(-p0 // 8) * 8
    ngp = -(-ng // 128) * 128                     # lane tile for (ng,.)
    # device-side slot matrices: permute/zero-pad atoms, then slice the
    # per-slot column sets s::gs into (pp, ngp) / (ngp, pp) stacks
    Dp = jnp.take(D, jnp.asarray(slot_atom.reshape(-1)), axis=1)
    Dp = Dp * jnp.asarray(
        slot_valid.reshape(-1).astype(np.float32)
    )[None, :]
    Dp = jnp.pad(Dp, ((0, pp - p0), (0, 0)))      # (pp, ng*gs)
    sl = Dp.reshape(pp, ng, gs)
    Ds = jnp.concatenate(
        [jnp.pad(sl[:, :, s], ((0, 0), (0, ngp - ng)))
         for s in range(gs)], axis=0,
    )                                             # (gs*pp, ngp)
    DsT = jnp.concatenate(
        [jnp.pad(sl[:, :, s].T, ((0, ngp - ng), (0, 0)))
         for s in range(gs)], axis=0,
    )                                             # (gs*ngp, pp)

    Np = -(-N // block) * block
    Xp = jnp.pad(X, ((0, pp - p0), (0, Np - N)))

    gam, gidx, aux = _group_fused_call(
        Xp, DsT, Ds,
        ng=ngp, gs=gs, T=T, block=block, interpret=interpret,
        packed=packed,
    )
    gam = gam[:, :N].T                             # (N, T*gs)
    gidx = gidx[:, :N].T                           # (N, T)
    err = aux[0, :N]
    nsel = aux[1, :N].astype(jnp.int32)
    # map (group, slot) -> original atom id via a tiny device-side table
    # gather; padded groups (>= ng) and padded members keep gamma 0
    table = jnp.asarray(slot_atom.astype(np.int32))     # (ng, gs)
    gclip = jnp.clip(gidx, 0, ng - 1)
    idx = jnp.take(table, gclip, axis=0).reshape(N, T * gs)
    return idx, gam, err, nsel, gidx
