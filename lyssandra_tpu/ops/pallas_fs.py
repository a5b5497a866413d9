"""Fused feature-sign COLD-START kernel: the unrolled growing-dimension
prefix (solvers/lasso._fs_unrolled_state) as one Pallas program per lane
block, solver state resident in VMEM.

Why: at the config-4 operating point the r8 XLA unroll (depth 28) IS the
runtime — ~all lanes finish inside it (ab_fs_unroll2.json) — and each of
its unrolled steps streams the (N, K) gradient, an (N, c, c) CG and an
(N, c+1) line search through HBM as dozens of separate XLA ops.  The
same computation per 256-lane block is: one (K, p) x (p, Nb) MXU matmul
(the gradient), a one-hot atom fetch, and a few thousand (1, Nb) row
FMAs whose state never leaves VMEM — the exact shape of win the fused
OMP kernel measured (3.4x) over its scan.

Semantics: step-for-step identical to ``_fs_unrolled_state`` (same
activation rule, ridge-regularized masked CG with the same trip count,
same discrete line search with argmin-first tie-break, same KKT exit and
freeze rules).  Differences are fp reassociation only (row FMA chains vs
HIGHEST einsums).  Parity is tested in interpreter mode and the final
optimum is pinned through the public ``feature_sign`` route.

Layout rules (all inherited from ops/pallas_omp.py — see its module
docstring): lanes-last everywhere; per-lane per-slot state as Python
lists of (1, Nb) rows (Mosaic rejects replicated-sublane relayouts);
value-carrying ``lax.cond`` is illegal, so lanes freeze via masked
selects; atom fetch is the exact 3-way bf16 one-hot matmul
(bitwise-equal to a gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lyssandra_tpu.ops.pallas_omp import _exact3_split

_HI = lax.Precision.HIGHEST


def _ceil8(n):
    return -(-n // 8) * 8


def _sign(v):
    """jnp.sign without relying on a Mosaic sign lowering."""
    return jnp.where(v > 0.0, 1.0, jnp.where(v < 0.0, -1.0, 0.0))


def _kernel_fs_cold(lam_ref, x_ref, dt_ref, d_ref, idx_ref, st_ref,
                    gr_ref, *, p, K, Tun, n_refine, dk_mode):
    # lam rides in SMEM as a scalar operand (NOT baked into the kernel):
    # a static lam would recompile the whole Mosaic program per lambda
    # value (30-270 s each on the remote compile helper) — pathological
    # for lam sweeps (ADVICE r3).
    lam = lam_ref[0]
    Nb = x_ref.shape[1]
    x = x_ref[...]                                    # (p, Nb)
    DT = dt_ref[...]                                  # (K, p)
    D = d_ref[...]                                    # (p, K)
    if dk_mode == "split3":
        Dh, Dm, Dl = _exact3_split(D)
    zero = jnp.zeros((1, Nb), jnp.float32)
    iota_k = lax.broadcasted_iota(jnp.int32, (K, Nb), 0)

    def grad_matmul(r):
        # full gradient 2 D^T r; HIGHEST like the XLA form's matmul
        return 2.0 * jnp.dot(DT, r, preferred_element_type=jnp.float32,
                             precision=_HI)

    def fetch_dk(k):
        if dk_mode == "split3":
            oh = (iota_k == k).astype(jnp.bfloat16)
            return (
                jnp.dot(Dh, oh, preferred_element_type=jnp.float32)
                + jnp.dot(Dm, oh, preferred_element_type=jnp.float32)
                + jnp.dot(Dl, oh, preferred_element_type=jnp.float32)
            )
        onehot = (iota_k == k).astype(jnp.float32)
        return jnp.dot(D, onehot, preferred_element_type=jnp.float32,
                       precision=_HI)

    # gradient at gamma = 0 is -2 A0 = 2 D^T (0 - x)
    gr = grad_matmul(-x)                              # (K, Nb)
    # NOTE: masks are carried as f32 0/1 rows and combined with
    # arithmetic (multiply = and, maximum = or, 1-x = not): selecting
    # BETWEEN bool vectors lowers to an i8->i1 arith.trunci that Mosaic
    # rejects on chip (found on the first chip run of this kernel);
    # bools appear only as fresh comparison results feeding jnp.where.
    donef = (jnp.max(jnp.abs(gr), axis=0, keepdims=True)
             <= lam + 1e-12).astype(jnp.float32)      # (1, Nb) 0/1

    # per-slot state rows (Python lists; lists of lists for Gsel)
    idx_r = [jnp.zeros((1, Nb), jnp.int32) for _ in range(Tun)]
    mask_r = [zero for _ in range(Tun)]
    theta_r = [zero for _ in range(Tun)]
    g_r = [zero for _ in range(Tun)]
    a0_r = [zero for _ in range(Tun)]
    dsel = [jnp.zeros((p, Nb), jnp.float32) for _ in range(Tun)]
    G = [[zero for _ in range(Tun)] for _ in range(Tun)]

    def build_is_act(t, mrows):
        a = jnp.zeros((K, Nb), jnp.float32)
        for j in range(t):
            a = jnp.maximum(
                a, (iota_k == idx_r[j]).astype(jnp.float32) * mrows[j]
            )
        return a

    def masked_cg(c, maskf, rhs, x0, iters):
        # ridge-regularized masked CG, same fixed point and trip count as
        # _fs_unrolled_state.masked_cg — all quantities (1, Nb) rows
        def op(v):
            out = []
            for a in range(c):
                Mv = sum((G[a][b] * (v[b] * maskf[b]) for b in range(c)),
                         zero)
                out.append(maskf[a] * Mv + (1.0 - maskf[a]) * v[a]
                           + 1e-6 * v[a])
            return out

        xr = [x0[a] * maskf[a] for a in range(c)]
        ox = op(xr)
        r = [rhs[a] - ox[a] for a in range(c)]
        pv = list(r)
        rs = sum((r[a] * r[a] for a in range(c)), zero)
        for _ in range(iters):
            Mp = op(pv)
            al = rs / (sum((pv[a] * Mp[a] for a in range(c)), zero)
                       + 1e-30)
            xr = [xr[a] + al * pv[a] for a in range(c)]
            r = [r[a] - al * Mp[a] for a in range(c)]
            rs2 = sum((r[a] * r[a] for a in range(c)), zero)
            bt = rs2 / (rs + 1e-30)
            pv = [r[a] + bt * pv[a] for a in range(c)]
            rs = rs2
        return [xr[a] * maskf[a] for a in range(c)]

    for t in range(Tun):
        c = t + 1
        # --- activation: largest inactive KKT violator ---
        is_act = build_is_act(t, mask_r)
        cand = jnp.where(is_act > 0.5, -1.0, jnp.abs(gr))
        mx = jnp.max(cand, axis=0, keepdims=True)
        k = jnp.min(jnp.where(cand == mx, iota_k, K), axis=0,
                    keepdims=True)
        livef = ((mx > lam * (1.0 + 1e-4) + 1e-7).astype(jnp.float32)
                 * (1.0 - donef))
        activate = livef > 0.5
        dk = fetch_dk(k) * livef                      # (p, Nb)
        a0k = jnp.sum(dk * x, axis=0, keepdims=True)
        gr_at = jnp.sum(jnp.where(iota_k == k, gr, 0.0), axis=0,
                        keepdims=True)
        thk = -_sign(gr_at) * livef

        # --- grow the compact active geometry by one slot ---
        for j in range(t):
            cross = jnp.sum(dsel[j] * dk, axis=0, keepdims=True)
            G[t][j] = cross
            G[j][t] = cross
        G[t][t] = jnp.sum(dk * dk, axis=0, keepdims=True)
        dsel[t] = dk
        idx_r[t] = jnp.where(activate, k, 0)
        mask_r[t] = livef
        theta_r[t] = thk
        g_r[t] = zero
        a0_r[t] = a0k

        # snapshot = post-activation, pre-refinement state (what a done
        # lane keeps — matches _fs_unrolled_state's fz(new, old))
        snap_mask = list(mask_r[:c])
        snap_theta = list(theta_r[:c])
        snap_g = list(g_r[:c])

        # --- n_refine fixed feature-sign refinements at width c ---
        m2 = list(mask_r[:c])
        th2 = list(theta_r[:c])
        g2 = list(g_r[:c])
        Hg = [sum((G[a][b] * g2[b] for b in range(c)), zero)
              for a in range(c)]
        for _ in range(n_refine):
            maskf = list(m2)
            a0m = [a0_r[a] * maskf[a] for a in range(c)]
            rhs = [(a0m[a] - lam * th2[a] / 2.0) * maskf[a]
                   for a in range(c)]
            if c == 1:
                gnew = [rhs[0] / (G[0][0] + 1e-6) * maskf[0]]
            else:
                gnew = masked_cg(c, maskf, rhs, g2, c + 1)
            Hnew = [sum((G[a][b] * gnew[b] for b in range(c)), zero)
                    for a in range(c)]

            # discrete line search over zero crossings; candidate 0 is
            # the full step, then one per slot; argmin keeps the FIRST
            # minimum (strict < on later candidates)
            diff = [gnew[a] - g2[a] for a in range(c)]
            Hd = [Hnew[a] - Hg[a] for a in range(c)]
            b_lin = 2.0 * (
                sum((diff[a] * Hg[a] for a in range(c)), zero)
                - sum((diff[a] * a0m[a] for a in range(c)), zero)
            )
            cq = sum((diff[a] * Hd[a] for a in range(c)), zero)

            def obj_at(ts):
                l1 = sum(
                    (jnp.abs(g2[a] + ts * diff[a]) * maskf[a]
                     for a in range(c)),
                    zero,
                )
                return ts * b_lin + ts * ts * cq + lam * l1

            one = jnp.ones((1, Nb), jnp.float32)
            best_obj = obj_at(one)
            tbest = one
            for a in range(c):
                big = jnp.abs(diff[a]) > 1e-15
                tc = jnp.where(
                    big, -g2[a] / jnp.where(big, diff[a], 1.0), -1.0
                )
                valid = (tc > 0.0) & (tc < 1.0) & (m2[a] > 0.5)
                ts = jnp.where(valid, tc, 1.0)
                obj = obj_at(ts)
                better = obj < best_obj
                best_obj = jnp.where(better, obj, best_obj)
                tbest = jnp.where(better, ts, tbest)

            gbest = [g2[a] + tbest * diff[a] for a in range(c)]
            Hg = [Hg[a] + tbest * Hd[a] for a in range(c)]
            nz = [(jnp.abs(gbest[a]) >= 1e-12).astype(jnp.float32)
                  for a in range(c)]
            m2 = [m2[a] * nz[a] for a in range(c)]
            g2 = [gbest[a] * m2[a] for a in range(c)]
            th2 = [_sign(gbest[a]) * m2[a] for a in range(c)]

        # --- full gradient (residual form) + full KKT check ---
        maskf = list(m2)
        R = -x
        for a in range(c):
            R = R + dsel[a] * g2[a]
        gr_new = grad_matmul(R)
        is_act2 = build_is_act(c, m2 + mask_r[c:])
        inact_mx = jnp.max(
            jnp.where(is_act2 > 0.5, 0.0, jnp.abs(gr_new)), axis=0,
            keepdims=True,
        )
        inact_violf = (inact_mx
                       > lam * (1.0 + 1e-4) + 1e-7).astype(jnp.float32)
        act_violf = zero
        for a in range(c):
            va = jnp.abs(
                2.0 * (Hg[a] - a0_r[a] * maskf[a]) * maskf[a]
                + lam * th2[a]
            ) * maskf[a] > 1e-4
            act_violf = jnp.maximum(act_violf, va.astype(jnp.float32))
        optf = (1.0 - inact_violf) * (1.0 - act_violf)

        # --- freeze done lanes at their pre-refinement state ---
        was_done = donef > 0.5
        for a in range(c):
            mask_r[a] = jnp.where(was_done, snap_mask[a], m2[a])
            theta_r[a] = jnp.where(was_done, snap_theta[a], th2[a])
            g_r[a] = jnp.where(was_done, snap_g[a], g2[a])
        gr = jnp.where(was_done, gr, gr_new)
        donef = jnp.maximum(donef, optf)

    # --- epilogue: emit rows ---
    idx_rows = idx_ref.shape[0]
    st_rows = st_ref.shape[0]
    for t in range(Tun):
        idx_ref[t:t + 1, :] = idx_r[t]
        st_ref[t:t + 1, :] = mask_r[t]
        st_ref[Tun + t:Tun + t + 1, :] = theta_r[t]
        st_ref[2 * Tun + t:2 * Tun + t + 1, :] = g_r[t]
    st_ref[3 * Tun:3 * Tun + 1, :] = donef
    for t in range(Tun, idx_rows):
        idx_ref[t:t + 1, :] = jnp.zeros((1, Nb), jnp.int32)
    for rr in range(3 * Tun + 1, st_rows):
        st_ref[rr:rr + 1, :] = zero
    gr_ref[...] = gr


@functools.partial(
    jax.jit,
    static_argnames=("t_unroll", "n_refine", "block", "dk_mode",
                     "interpret", "vmem_limit_mb"),
)
def fs_cold_fused(
    D: jax.Array, X: jax.Array, *, lam, t_unroll: int,
    n_refine: int = 2, block: int = 256, dk_mode: str = "split3",
    interpret: bool = False, vmem_limit_mb: int | None = None,
):
    """Fused feature-sign cold start.

    Returns ``(idx (N, Tun) i32, mask (N, Tun) bool, theta (N, Tun),
    gact (N, Tun), gr (N, K), done (N,) bool)`` — the compact state
    `_fs_unrolled_state` computes, ready for the `_fs_loop` handoff
    padding.  Padding lanes (N not a block multiple) are zero signals:
    their gradient is zero, so they are born done and stay inert.
    ``lam`` is a TRACED scalar (SMEM operand): sweeping lambda reuses
    one compiled kernel per shape.

    Shape padding (bitwise-neutral, same policy as `_omp_fused_call`):
    p is zero-padded to the 8-sublane tile and K to the 128-lane tile —
    zero rows add only +0.0 to every reduction; zero atoms have
    exactly-zero gradient, never clear the activation threshold, and
    the argmin-index tie-break never reaches them (a live lane's max
    violator is > 0).  Outputs are sliced back to the true K.
    """
    p0, K0 = D.shape
    N = X.shape[1]
    D = D.astype(jnp.float32)
    X = X.astype(jnp.float32)
    p = _ceil8(p0)
    K = -(-K0 // 128) * 128
    if p != p0:
        D = jnp.pad(D, ((0, p - p0), (0, 0)))
        X = jnp.pad(X, ((0, p - p0), (0, 0)))
    if K != K0:
        D = jnp.pad(D, ((0, 0), (0, K - K0)))
    Np = -(-N // block) * block
    if Np != N:
        X = jnp.concatenate(
            [X, jnp.zeros((p, Np - N), X.dtype)], axis=1
        )
    Tun = int(t_unroll)
    idx_rows = _ceil8(Tun)
    st_rows = _ceil8(3 * Tun + 1)
    if vmem_limit_mb is None:
        # the gr (K, Nb) value + its (K, Nb) activation/KKT temporaries +
        # the Tun x (p, Nb) selected-atom stack overflow Mosaic's 16 MB
        # scoped default already at p=192/depth 8 (20.9 MB measured);
        # the limit is a compiler knob, not hardware (v5e VMEM = 128 MB)
        # — raise it rather than fight the estimator (r9 lesson).
        vmem_limit_mb = 64
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
    )
    lam_arr = jnp.asarray(lam, jnp.float32).reshape((1,))
    idx, st, gr = pl.pallas_call(
        functools.partial(
            _kernel_fs_cold, p=p, K=K, Tun=Tun, n_refine=int(n_refine),
            dk_mode=dk_mode,
        ),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((p, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((idx_rows, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((st_rows, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((idx_rows, Np), jnp.int32),
            jax.ShapeDtypeStruct((st_rows, Np), jnp.float32),
            jax.ShapeDtypeStruct((K, Np), jnp.float32),
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(lam_arr, X, D.T, D)
    idx = idx[:Tun, :N].T
    mask = st[:Tun, :N].T > 0.5
    theta = st[Tun:2 * Tun, :N].T
    gact = st[2 * Tun:3 * Tun, :N].T
    done = st[3 * Tun, :N] > 0.5
    return idx, mask, theta, gact, gr[:K0, :N].T, done
