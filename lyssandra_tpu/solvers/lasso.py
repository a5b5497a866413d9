"""Batched convex sparse solvers: feature-sign search (lasso) and FISTA.

Feature-sign search (Lee, Battle, Raina, Ng, NIPS 2006) solves

    min_g ||x - D g||^2 + lam * ||g||_1

for thousands of signals at once as a ``lax.while_loop`` (SURVEY.md §7
step 5).  TPU-native shape discipline: the active set lives in a fixed
capacity of ``max_active`` slots per lane (static shapes); activation /
deactivation toggles slot masks; the analytic minimizer over the active set
is one batched (N, A, A) solve; the discrete line search over sign flips
evaluates all A+1 candidate crossings for every lane in one shot via the
active Gram.  Lanes freeze via a ``done`` mask when their KKT conditions
hold; the loop exits when all lanes are done.

FISTA is provided as a cheap alternative coder for the same objective
(useful inside online dictionary learning); it shares the objective
convention ``||.||^2`` (no 1/2) with the oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_HI = lax.Precision.HIGHEST


def _active_mask(idx, mask, K):
    """(N, K) active-atom membership mask from per-lane slots.

    On TPU the obvious ``zeros.at[rows, idx].max(mask)`` scatter
    serializes on per-lane collisions (micro_scatterfree.json: 1.75 ms
    at (2048, 64, 1024) vs 0.64 ms for the fused compare-reduce below —
    feature-sign pays it twice per outer iteration).  On CPU the
    element-wise scatter is near-free while the N*A*K compare-reduce is
    ~100x more work, so the form is backend-gated.

    The gate reads ``jax.default_backend()`` at TRACE time — the process
    default, not the device a jitted program actually runs on.  Under an
    explicit non-default placement (e.g. jit(..., device=cpu) in a TPU
    process) the slower-but-identical form is chosen; perf-only, and
    consistent with the repo's other backend gates (cold_backend,
    cold_unroll defaults).
    """
    if jax.default_backend() == "cpu":
        N = idx.shape[0]
        return jnp.zeros((N, K), bool).at[
            jnp.arange(N)[:, None], idx
        ].max(mask)
    kk = jnp.arange(K, dtype=idx.dtype)[None, None, :]
    return jnp.any((idx[:, :, None] == kk) & mask[:, :, None], axis=1)


_pallas_cold_warned = False


def _warn_pallas_cold_compile(depth: int) -> None:
    """One-line heads-up before the TPU default's Mosaic compile stall
    (VERDICT r4 #2): the fused cold-start kernel costs MINUTES of
    one-time compile per shape at depth >= ~16 (~460 s at 24, ~1,900 s
    at 28 — ab_fs_fused.json), and without a persistent compilation
    cache every process pays it again.  Fires once per process, only
    when no cache is configured and the depth is in the expensive
    range; silent otherwise."""
    global _pallas_cold_warned
    if _pallas_cold_warned or depth < 16:
        return
    from lyssandra_tpu.utils.compile_cache import cache_enabled

    if cache_enabled():
        return
    import warnings

    warnings.warn(
        f"feature_sign cold_backend='pallas' (the TPU default) compiles "
        f"a depth-{depth} Mosaic kernel on FIRST use at a new shape — "
        f"minutes of one-time compile (~1,900 s at the depth-28 "
        f"default; ab_fs_fused.json).  Call "
        f"lyssandra_tpu.enable_compile_cache() before first use to skip "
        f"recompiles across processes (probe_compile_cache.json), or "
        f"pass cold_backend='xla' for fresh-shape sweeps.",
        stacklevel=3,
    )
    _pallas_cold_warned = True


class FeatureSignResult(NamedTuple):
    Gamma: jax.Array      # (K, N) dense codes
    n_iter: jax.Array     # () outer iterations executed
    done: jax.Array       # (N,) per-lane convergence flag
    overflow: jax.Array   # (N,) lane wanted > max_active active atoms


def _fs_loop(Dt, Xt, A0, lam, state, *, max_active, max_iter, max_inner,
             max_cg=32, n_activate=1):
    """Up to ``max_iter`` outer feature-sign iterations from ``state``.

    TPU lowering notes (all measured; see CLAUDE.md):
    - The active-set Gram M is built from GATHERED ATOMS — Dact (N, A, p)
      then one MXU einsum — never by gathering rows of the (K, K) Gram:
      per-lane (N, A, K) row gathers are ~20x slower than the matmul and
      materialize gigabytes at the config-4 operating point.
    - M and a0sel depend only on ``idx``, which is constant through the
      inner refinement loop — they are hoisted OUT of the while_loop body
      (the round-1 version recomputed the gather in both the body and the
      cond, twice per refinement step).
    - The full gradient uses the residual form 2 D^T (D g - x) with D g
      built from the GATHERED active atoms (einsum over Dact) — no (N, K)
      dense code, no scatter; 2NpK flops for the correlation GEMM vs the
      Gram form's 2NK^2, same trick as batch_omp's refresh='auto'.
    - (N, K) active-membership masks use :func:`_active_mask` (fused
      compare-reduce on TPU, scatter on CPU) — see micro_scatterfree.json.

    Dt = D^T (K, p); Xt = X^T (N, p); A0 = X^T D (N, K).
    """
    N, K = A0.shape
    A = max_active

    def dense(idx, mask, gact):
        z = jnp.zeros((N, K), A0.dtype)
        return z.at[jnp.arange(N)[:, None], idx].add(
            jnp.where(mask, gact, 0.0)
        )

    def outer_step(st):
        idx, mask, theta, gact, gr, done, overflow, it = st
        # gr = grad at the CURRENT solution ZEROED AT ACTIVE SLOTS,
        # CARRIED from the previous iteration's final KKT check (it is
        # the same quantity): computing it fresh here doubled the two
        # big (N, p <-> K) matmuls per outer iteration (r3, ~1.5x end to
        # end), and recomputing the (N, K) membership mask here doubled
        # the _active_mask compare-reduce (r11: 1.9 ms of a 17 ms outer
        # iteration at 2048 lanes).  The masked-gr invariant is upheld
        # by every state producer (_fs_init: empty active set;
        # _fs_warm_state / _fs_unrolled_state[_fused]: explicit mask).

        # activation threshold carries a relative slack matched to the
        # done check below: in fp32 an atom with |gr| ~ lam flickers
        # across an exact threshold between iterations (activate ->
        # line-search zeroes it -> deactivate -> ...), limit-cycling 87%
        # of lanes to max_iter (measured on chip).  Ignoring a violation
        # of lam*(1+1e-4) costs O((|gr|-lam)^2) ~ 1e-8 lam^2 in objective.
        # Active slots carry exactly 0 in gr, which never clears the
        # strictly-positive threshold — no re-activation possible.
        cand_score = jnp.abs(gr)
        # activate the top-n_activate violators per outer iteration
        # (n_activate=1 is the oracle's literal one-at-a-time path; the
        # lasso minimizer is path-independent, so activating several at
        # once reaches the SAME optimum in fewer straggler-ridden outer
        # iterations — each candidate still individually clears the
        # threshold, and refinement prunes any that shouldn't have
        # joined).  The unrolled slot-placement loop below stays cheap:
        # n_activate one_hot/argmin rounds of (N, A) bool ops.
        vals, kstars = lax.top_k(cand_score, n_activate)   # (N, n_act)

        # first free slot (mask False); a lane with no free slot skips
        # activation this step but still refines — refinement prunes
        # atoms, so "full at entry" is NOT terminal.  Overflow is decided
        # AFTER the inner loop (see below); the old entry-time freeze
        # locked warm-started lanes with transiently-full slots into the
        # dense polish path (config4 r4 regression).
        idx2, mask2, theta2, gact2 = idx, mask, theta, gact
        for j in range(n_activate):
            kj = kstars[:, j].astype(jnp.int32)
            has_cand = vals[:, j] > lam * (1.0 + 1e-4) + 1e-7
            free = jnp.argmin(
                mask2.astype(jnp.int32), axis=1
            ).astype(jnp.int32)
            no_free = jnp.all(mask2, axis=1)
            activate = has_cand & ~done & ~no_free
            slot_hot = (jax.nn.one_hot(free, A, dtype=bool)
                        & activate[:, None])
            idx2 = jnp.where(slot_hot, kj[:, None], idx2)
            mask2 = mask2 | slot_hot
            gr_at = jnp.take_along_axis(gr, kj[:, None], 1)[:, 0]
            theta2 = jnp.where(slot_hot, -jnp.sign(gr_at)[:, None],
                               theta2)
            gact2 = jnp.where(slot_hot, 0.0, gact2)

        # idx is constant through the refinement loop: hoist the active-set
        # geometry (Dact -> M, a0sel) out of the while_loop
        Dact = jnp.take(Dt, idx2, axis=0)                   # (N, A, p)
        M = jnp.einsum("nap,nbp->nab", Dact, Dact, precision=_HI)
        a0all = jnp.einsum("nap,np->na", Dact, Xt, precision=_HI)

        def active_mv(g):
            # Hg := M @ (g * mask); with g masked this is the active-set
            # Gram matvec.  precision matters: DEFAULT lowers to bf16 on
            # TPU and floors downstream violation estimates at ~1e-3 —
            # lanes then never pass the 1e-4 done check (measured: 87% of
            # lanes stuck at max_iter)
            return jnp.einsum("nab,nb->na", M, g, precision=_HI)

        def kkt_from_H(mask, theta, Hg, tol=5e-6):
            # active-set KKT residual from the CACHED matvec Hg = M@g:
            # grad_A = 2 (mask*(Hg - a0)); the inner loop maintains Hg by
            # affine updates of exact matvecs (drift from zeroing <1e-12
            # coefficients at deactivation is <=~1e-10, far below tol)
            maskf = mask.astype(A0.dtype)
            viol = jnp.abs(
                2.0 * (Hg - a0all) * maskf + lam * theta
            ) * maskf
            return jnp.any(viol > tol, axis=1) & jnp.any(mask, axis=1)

        def masked_solve(maskf, rhs, gwarm):
            """Solve (mask M mask + (1-mask) I + 1e-6 I) g = rhs by CG,
            warm-started.  A direct batched LU at (N, A, A) costs ~92 ms on
            chip (measured) and ran up to 20x per outer iteration; the
            active-set minimizer moves little between refinements, so
            warm-started CG exits in a handful of ~1 ms einsum matvecs."""

            def op(v):
                # HIGHEST precision: CG convergence below 1e-4 requires
                # fp32-accurate matvecs (bf16 DEFAULT stagnates at ~1e-3)
                Mv = jnp.einsum("nab,nb->na", M, v * maskf, precision=_HI)
                return maskf * Mv + (1.0 - maskf) * v + 1e-6 * v

            x0 = gwarm * maskf
            r0 = rhs - op(x0)

            def cg_step(st):
                x, r, pv, rs, i = st
                Mp = op(pv)
                al = rs / (jnp.einsum("na,na->n", pv, Mp, precision=_HI) + 1e-30)
                x = x + al[:, None] * pv
                r = r - al[:, None] * Mp
                rs2 = jnp.einsum("na,na->n", r, r, precision=_HI)
                pv = r + (rs2 / (rs + 1e-30))[:, None] * pv
                return (x, r, pv, rs2, i + 1)

            def cg_cond(st):
                _, _, _, rs, i = st
                return (i < max_cg) & jnp.any(rs > 1e-12)  # ||r|| > 1e-6

            rs0 = jnp.einsum("na,na->n", r0, r0, precision=_HI)
            x, *_ = lax.while_loop(
                cg_cond, cg_step, (x0, r0, r0, rs0, jnp.zeros((), jnp.int32))
            )
            return x * maskf

        def inner_step(st):
            """One feature-sign refinement over the active set."""
            mask, theta, gact, Hg, iref, _ = st
            maskf = mask.astype(A0.dtype)
            a0sel = a0all * maskf
            rhs = (a0sel - lam * theta / 2.0) * maskf
            gnew = masked_solve(maskf, rhs, gact)
            Hnew = active_mv(gnew)          # the step's ONE exact matvec

            # discrete line search over zero crossings of g + t (gnew - g):
            # along the segment the smooth part is the 1-D quadratic
            #   q(t) = t * (-2 diff.a0 + 2 diff.Hg) + t^2 * diff.Hd
            # (offset obj(0) dropped — same argmin), so the old 65-matvec
            # einsum("nab,ncb->nca") collapses to two dot products against
            # the cached matvecs (r5: line search was ~30% of the inner
            # step at the config-4 shape); only the piecewise-linear l1
            # term is evaluated per candidate.
            diff = gnew - gact
            Hd = Hnew - Hg
            tcross = jnp.where(
                jnp.abs(diff) > 1e-15, -gact / jnp.where(
                    jnp.abs(diff) > 1e-15, diff, 1.0
                ), -1.0
            )
            valid_t = (tcross > 0.0) & (tcross < 1.0) & mask
            ts = jnp.concatenate(
                [jnp.ones((N, 1), A0.dtype),
                 jnp.where(valid_t, tcross, 1.0)],
                axis=1,
            )                                                # (N, A+1)
            b = 2.0 * (
                jnp.einsum("na,na->n", diff, Hg, precision=_HI)
                - jnp.einsum("na,na->n", diff, a0sel, precision=_HI)
            )
            c = jnp.einsum("na,na->n", diff, Hd, precision=_HI)
            l1 = jnp.sum(
                jnp.abs(gact[:, None, :] + ts[..., None] * diff[:, None, :])
                * maskf[:, None, :],
                axis=2,
            )
            obj = ts * b[:, None] + ts * ts * c[:, None] + lam * l1
            best = jnp.argmin(obj, axis=1)
            tbest = jnp.take_along_axis(ts, best[:, None], axis=1)[:, 0]
            gbest = gact + tbest[:, None] * diff
            Hbest = Hg + tbest[:, None] * Hd

            # deactivate zeroed coefficients
            nz = jnp.abs(gbest) >= 1e-12
            mask2 = mask & nz
            gact2 = jnp.where(mask2, gbest, 0.0)
            theta2 = jnp.where(mask2, jnp.sign(gbest), 0.0)
            return (mask2, theta2, gact2, Hbest, iref + 1,
                    kkt_from_H(mask2, theta2, Hbest))

        def inner_cond(st):
            *_, iref, not_opt = st
            return (iref < max_inner) & jnp.any(not_opt)

        Hg0 = active_mv(gact2)
        mask3, theta3, gact3, Hg3, _, not_opt3 = lax.while_loop(
            inner_cond, inner_step,
            (mask2, theta2, gact2, Hg0, jnp.zeros((), jnp.int32),
             kkt_from_H(mask2, theta2, Hg0)),
        )

        # full KKT check: zero-coefficient condition AND active-set
        # stationarity — a lane can exit the inner loop on max_inner
        # mid-limit-cycle with a LARGE active violation, and must not be
        # declared done on the inactive condition alone.  The done
        # tolerance (1e-4) is looser than the inner continuation tolerance
        # (1e-7): fp32 refinement stalls around ~1e-6 violations, which are
        # converged for every practical purpose, while a genuine mid-cycle
        # exit violates by O(lam).
        del not_opt3
        # gradient from the GATHERED active atoms: D g = Dact^T gact needs
        # no (N, K) dense code and no scatter (gact3 is zero outside
        # mask3; inert Dact rows are multiplied by those zeros).  The
        # dense-scatter form costs 1.84 ms vs 1.16 ms at (2048, 64, 1024)
        # (micro_scatterfree.json) and wins on CPU too (16x fewer flops).
        R3 = jnp.einsum("na,nap->np", jnp.where(mask3, gact3, 0.0),
                        Dact, precision=_HI) - Xt
        gr3 = 2.0 * jnp.matmul(R3, Dt.T, precision=_HI)
        # ONE membership compare-reduce per outer iteration: the masked
        # gradient is both the inactive-KKT quantity here and the next
        # iteration's activation score (carried below)
        is_act3 = _active_mask(idx2, mask3, K)
        grm3 = jnp.where(is_act3, 0.0, gr3)
        inact_viol3 = jnp.abs(grm3) > lam * (1.0 + 1e-4) + 1e-7
        opt = ~jnp.any(inact_viol3, axis=1) & ~kkt_from_H(
            mask3, theta3, Hg3, tol=1e-4
        )
        # terminal overflow: POST-refinement the lane still wants a new
        # atom and has no slot for it — growth is genuinely blocked
        ovf = overflow | (
            jnp.any(inact_viol3, axis=1) & jnp.all(mask3, axis=1) & ~done
        )
        done2 = done | opt | ovf

        # frozen lanes keep previous state
        fz1 = lambda new, old: jnp.where(done[:, None], old, new)
        return (
            fz1(idx2, idx), fz1(mask3, mask), fz1(theta3, theta),
            fz1(gact3, gact), fz1(grm3, gr), done2, ovf, it + 1,
        )

    it0 = state[-1]

    def outer_cond(st):
        *_, done, _, it = st
        return (it - it0 < max_iter) & ~jnp.all(done)

    st = lax.while_loop(outer_cond, outer_step, state)
    idx, mask, theta, gact, gr, done, overflow, it = st
    gfull = dense(idx, mask, gact)
    return st, FeatureSignResult(gfull.T, it, done, overflow)


@functools.partial(
    jax.jit, static_argnames=("max_active", "max_iter", "max_inner",
                              "max_cg", "n_activate")
)
def _feature_sign_impl(
    Dt, Xt, A0, lam, state, *, max_active, max_iter, max_inner,
    max_cg=32, n_activate=1,
):
    """One jitted SEGMENT of up to max_iter outer iterations from ``state``.
    Segmenting keeps each device program short — a single unbounded
    while_loop can exceed the TPU worker's kernel watchdog on dense
    problems (see ``feature_sign``).  ``max_iter`` is STATIC: the r5
    escalating plan compiles one executable per distinct segment size
    (at most 3: 16/32/64).  A traced bound would share one executable
    and was briefly tried; during that investigation the full
    --runslow suite exposed a WANDERING XLA:CPU compiler segfault late
    in marathon compile sessions (site moved with unrelated code
    shuffles; mitigated by per-module jax.clear_caches in
    tests/conftest.py), so the static form is kept as the conservative
    choice — its cost is two extra small-program compiles per shape."""
    return _fs_loop(
        Dt, Xt, A0, lam, state,
        max_active=max_active, max_iter=max_iter, max_inner=max_inner,
        max_cg=max_cg, n_activate=n_activate,
    )


def _fs_init(A0, lam, A):
    N = A0.shape[0]
    # lanes where g = 0 already satisfies the KKT conditions:
    # |grad| = |2 D^T x| <= lam everywhere
    done0 = jnp.all(2.0 * jnp.abs(A0) <= lam + 1e-12, axis=1)
    return (
        jnp.zeros((N, A), jnp.int32),
        jnp.zeros((N, A), bool),
        jnp.zeros((N, A), A0.dtype),
        jnp.zeros((N, A), A0.dtype),
        -2.0 * A0,          # grad at g = 0 (carried through outer_step)
        done0,
        jnp.zeros((N,), bool),
        jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("n_warm",))
def _fs_fista_iterate(D, Xt, A0, lam, *, n_warm):
    """The warm-start FISTA iterate G0^T (N, K), as its own jitted program
    so the auto-capacity path can inspect it before committing to an
    active-set width (see :func:`feature_sign`)."""
    N, K = A0.shape
    G0 = _fista_body(D, Xt.T, A0.T, lam, jnp.zeros((K, N), A0.dtype),
                     n_warm)
    return G0.T


def _fs_sig_nnz(G0t):
    """Per-lane count of SIGNIFICANT warm coefficients: |g| above 1e-3 of
    the lane's max.  An unconverged FISTA iterate carries a tail of tiny
    not-yet-rezeroed coefficients (measured: >1e-12 counts 3-10x the
    dominant-support size), so raw nnz both overestimates the needed
    capacity and wastes warm slots on junk; the relative cut matches the
    support feature-sign actually keeps after one refinement."""
    mx = jnp.max(jnp.abs(G0t), axis=1, keepdims=True)
    tau = jnp.maximum(1e-3 * mx, 1e-12)
    return jnp.sum(jnp.abs(G0t) > tau, axis=1), tau


def _fs_omp_seed_iterate(D, Xt, n_atoms: int):
    """OMP-seeded warm iterate G0^T (N, K): batch_omp at T=n_atoms runs
    at ~3.4M patches/s on chip (vs the feature-sign loop's ~2-7k), so a
    few-atom greedy support costs ~nothing.  Unlike the FISTA iterate
    (junk-laden before convergence — the r5 measured loss), the greedy
    support is small and high-signal; the magnitudes are least-squares
    fits that feature-sign's first refinement re-shrinks to the lasso
    values."""
    from lyssandra_tpu.solvers.greedy import batch_omp

    return batch_omp(D, Xt.T, int(n_atoms)).T


def _fs_warm_init(D, Dt, Xt, A0, lam, *, max_active, n_warm):
    """Feature-sign state warm-started from an ``n_warm``-iteration FISTA
    run (device-side; no host traffic).

    The idea: feature-sign activates ONE atom per outer iteration, so a
    cold start on a lane whose solution has s nonzeros needs >= s outer
    iterations.  A short FISTA run costs two thin matmuls per iteration
    and lands on (most of) the true support; feature-sign then only
    refines: spurious atoms deactivate inside one inner loop, missed
    atoms join one per outer step, and the final KKT check certifies the
    SAME optimum (the lasso minimizer is unique under general position —
    tests pin objective parity with the cold path).

    History: this won 1.9x in r4 (ab_fs_warm.json) when each saved outer
    iteration cost a ~65-matvec line search; the r5 cached-matvec inner
    step made outer iterations cheap enough that the seed is now a net
    chip LOSS at every measured operating point (ab_fs_design.json) —
    hence warm_start defaults to 0 and this path is opt-in.
    """
    G0t = _fs_fista_iterate(D, Xt, A0, lam, n_warm=n_warm)
    return _fs_warm_state(G0t, Dt, Xt, A0, lam, max_active=max_active)


@functools.partial(jax.jit, static_argnames=("max_active", "gate"))
def _fs_warm_state(G0t, Dt, Xt, A0, lam, *, max_active, gate=True):
    """Build the feature-sign loop state from a precomputed warm iterate
    G0t (N, K) — see :func:`_fs_warm_init` for the rationale and gating."""
    N, K = A0.shape
    A = max_active
    kk = min(A, K)                     # capacity can exceed tiny K
    vals, idx = lax.top_k(jnp.abs(G0t), kk)           # (N, kk) distinct
    if kk < A:
        vals = jnp.pad(vals, ((0, 0), (0, A - kk)))
        idx = jnp.pad(idx, ((0, 0), (0, A - kk)))
    idx = idx.astype(jnp.int32)
    nnz_lane, tau = _fs_sig_nnz(G0t)
    # seed only SIGNIFICANT coefficients (see _fs_sig_nnz): the iterate's
    # tiny unconverged tail is junk that wastes slots; a dropped true-
    # support atom simply rejoins one per outer step
    mask = vals > tau
    if gate:
        # Per-lane gate: the warm support is only usable when FISTA
        # actually FOUND a small support.  On coherent dictionaries (e.g.
        # a partially-trained online-DL dict at config-4 shape) the
        # 40-iteration iterate is still dense — ~190 nonzeros/lane with
        # no magnitude separation vs the true optimum's ~7 (measured) —
        # and seeding top-A junk atoms both fills every slot (lanes froze
        # as overflow before refinement could prune: avg_nnz 4.5 -> 65,
        # config4 r4) and builds an ill-conditioned active Gram (CG blew
        # up to obj ~1e36 in the r5 A/B).  Such lanes fall back to a cold
        # start.
        lane_ok = nnz_lane <= jnp.asarray(A - max(1, A // 8), jnp.int32)
        mask = mask & lane_ok[:, None]
    else:
        # ungated (narrow-capacity path): seed the TOP few atoms only and
        # keep join headroom — a small seed keeps the active Gram
        # well-conditioned even on coherent dictionaries (r5 CPU A/B:
        # A=16 ungated 3.2x over cold, 2/512 overflow lanes; the blow-up
        # above only occurs when ~56 coherent atoms are seeded at once).
        # Overflow is handled by the caller's exact full-capacity
        # re-solve.
        slot_cap = jnp.arange(A)[None, :] < (A - max(2, A // 8))
        mask = mask & slot_cap
    gact = jnp.where(mask,
                     jnp.take_along_axis(G0t, idx, axis=1), 0.0)
    theta = jnp.where(mask, jnp.sign(gact), 0.0)
    # gradient at the REPRESENTABLE warm point (beyond-capacity atoms
    # dropped by top_k), consistent with the carried-gr invariant
    gfull = jnp.zeros((N, K), A0.dtype).at[
        jnp.arange(N)[:, None], idx
    ].add(jnp.where(mask, gact, 0.0))
    R = jnp.matmul(gfull, Dt, precision=_HI) - Xt
    gr = 2.0 * jnp.matmul(R, Dt.T, precision=_HI)
    # uphold the carried-masked-gr invariant (_fs_loop: gr is zero at
    # active slots — it doubles as the next activation score)
    gr = jnp.where(_active_mask(idx, mask, K), 0.0, gr)
    # lanes where g = 0 is optimal may be declared done immediately ONLY
    # if their warm state is actually zero (a done lane keeps its state)
    done0 = jnp.all(2.0 * jnp.abs(A0) <= lam + 1e-12, axis=1) & ~jnp.any(
        mask, axis=1
    )
    return (
        idx, mask, theta, gact, gr, done0,
        jnp.zeros((N,), bool), jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("t_unroll", "n_refine", "max_active")
)
def _fs_unrolled_state(Dt, Xt, A0, lam, *, t_unroll, n_refine,
                       max_active):
    """Unrolled growing-dimension cold start (nn_omp's r7 trick ported to
    the convex path).

    Feature-sign activates ONE atom per outer iteration, so a cold lane
    whose solution has s nonzeros (mean 4.5 at the config-4 operating
    point) spends its first ~s outer iterations with an active set of
    size <= s — yet the while_loop form pays full (N, A=64, A=64)
    active-Gram einsums, an up-to-32-step CG and an A+1-candidate line
    search per refinement, and rides every block's slowest lane.  This
    path Python-unrolls the first ``t_unroll`` activations with every
    shape static and sized to the TRUE active dimension: step c's solve
    is a (c+1)-iteration CG on (N, c, c) systems (closed form at c=1),
    the line search scores c+1 candidates, and the full gradient uses
    the compact residual form einsum("nc,ncp->np") — half the flops of
    the dense-code form.  Each step runs ``n_refine`` fixed refinements
    (no inner while_loop, no straggler riding).

    Returns a :func:`_fs_loop` state tuple padded to ``max_active``
    slots: lanes whose full KKT conditions hold are ``done`` and freeze;
    stragglers continue in the existing segmented while_loop, so the
    optimum (and every exit criterion) is IDENTICAL to the cold path —
    only the iteration cost changes.  Deactivated slots are not reused
    (a reactivation takes a fresh slot) — capacity waste bounded by
    t_unroll << max_active.

    Compile-time cost: the graph grows O(t_unroll^2) ops — measured
    ~160 s of XLA *CPU* compile per shape at the TPU-default depth 28
    (vs ~5 s for the while_loop form).  The policy is backend-gated
    (``feature_sign``: cold_unroll=None -> 28 on TPU, 0 on CPU).  The
    fused Pallas builder (ops/pallas_fs.py) pays the SAME order of
    compile cost (~24 s at depth 8 to ~400 s at depth 24, Mosaic;
    the r3 "~1 s" reads were pre-warmed — ab_fs_fused.json r4); its
    win over this XLA form is RUNTIME (VMEM-resident state), not
    compile time.
    """
    N, K = A0.shape
    dt = A0.dtype
    rows = jnp.arange(N)[:, None]

    done = jnp.all(2.0 * jnp.abs(A0) <= lam + 1e-12, axis=1)
    gr = -2.0 * A0                      # gradient at g = 0

    idx = jnp.zeros((N, 0), jnp.int32)
    mask = jnp.zeros((N, 0), bool)
    theta = jnp.zeros((N, 0), dt)
    gact = jnp.zeros((N, 0), dt)
    a0sel = jnp.zeros((N, 0), dt)
    Dstack = jnp.zeros((N, 0, Dt.shape[1]), dt)
    Gsel = jnp.zeros((N, 0, 0), dt)

    def masked_cg(M, maskf, rhs, x0, iters):
        # same fixed point as _fs_loop's masked_solve: ridge-regularized
        # masked system (mask M mask + (1-mask) I + 1e-6 I) g = rhs
        def op(v):
            Mv = jnp.einsum("nab,nb->na", M, v * maskf, precision=_HI)
            return maskf * Mv + (1.0 - maskf) * v + 1e-6 * v

        x = x0 * maskf
        r = rhs - op(x)
        pv = r
        rs = jnp.einsum("na,na->n", r, r, precision=_HI)
        for _ in range(iters):          # tiny static trip count: unroll
            Mp = op(pv)
            al = rs / (jnp.einsum("na,na->n", pv, Mp, precision=_HI)
                       + 1e-30)
            x = x + al[:, None] * pv
            r = r - al[:, None] * Mp
            rs2 = jnp.einsum("na,na->n", r, r, precision=_HI)
            pv = r + (rs2 / (rs + 1e-30))[:, None] * pv
            rs = rs2
        return x * maskf

    for t in range(t_unroll):
        # --- activation: the single largest inactive KKT violator ---
        # gr carries the masked-gradient invariant (zero at active
        # slots, see _fs_loop), so no membership mask is rebuilt here:
        # active slots score 0 and never clear the positive threshold
        cand = jnp.abs(gr)
        mx = jnp.max(cand, axis=1)
        k = jnp.argmax(cand, axis=1).astype(jnp.int32)
        activate = (mx > lam * (1.0 + 1e-4) + 1e-7) & ~done
        livef = activate.astype(dt)
        dk = jnp.take(Dt, k, axis=0) * livef[:, None]       # (N, p)
        a0k = jnp.sum(dk * Xt, axis=1)          # inert slot: all-zero
        gr_at = jnp.take_along_axis(gr, k[:, None], 1)[:, 0]
        thk = -jnp.sign(gr_at) * livef

        # --- grow the compact active geometry by one slot ---
        if t == 0:
            Gsel = jnp.sum(dk * dk, axis=1)[:, None, None]
        else:
            cross = jnp.einsum("ncp,np->nc", Dstack, dk, precision=_HI)
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
        idx = jnp.concatenate(
            [idx, jnp.where(activate, k, 0)[:, None]], axis=1
        )
        mask0 = jnp.concatenate([mask, activate[:, None]], axis=1)
        theta0 = jnp.concatenate([theta, thk[:, None]], axis=1)
        gact0 = jnp.concatenate([gact, jnp.zeros((N, 1), dt)], axis=1)
        a0sel = jnp.concatenate([a0sel, a0k[:, None]], axis=1)
        c = t + 1

        # --- n_refine fixed feature-sign refinements at width c ---
        mask2, theta2, gact2 = mask0, theta0, gact0
        Hg = jnp.einsum("nab,nb->na", Gsel, gact2, precision=_HI)
        for _ in range(n_refine):
            maskf = mask2.astype(dt)
            a0m = a0sel * maskf
            rhs = (a0m - lam * theta2 / 2.0) * maskf
            if c == 1:
                gnew = rhs / (Gsel[:, :, 0] + 1e-6) * maskf
            else:
                gnew = masked_cg(Gsel, maskf, rhs, gact2, c + 1)
            Hnew = jnp.einsum("nab,nb->na", Gsel, gnew, precision=_HI)

            # discrete line search over zero crossings (same math as
            # _fs_loop's inner_step, at compact width)
            diff = gnew - gact2
            Hd = Hnew - Hg
            tcross = jnp.where(
                jnp.abs(diff) > 1e-15, -gact2 / jnp.where(
                    jnp.abs(diff) > 1e-15, diff, 1.0
                ), -1.0
            )
            valid_t = (tcross > 0.0) & (tcross < 1.0) & mask2
            ts = jnp.concatenate(
                [jnp.ones((N, 1), dt), jnp.where(valid_t, tcross, 1.0)],
                axis=1,
            )                                               # (N, c+1)
            b = 2.0 * (
                jnp.einsum("na,na->n", diff, Hg, precision=_HI)
                - jnp.einsum("na,na->n", diff, a0m, precision=_HI)
            )
            cq = jnp.einsum("na,na->n", diff, Hd, precision=_HI)
            l1 = jnp.sum(
                jnp.abs(gact2[:, None, :] + ts[..., None] * diff[:, None, :])
                * maskf[:, None, :],
                axis=2,
            )
            obj = ts * b[:, None] + ts * ts * cq[:, None] + lam * l1
            best = jnp.argmin(obj, axis=1)
            tbest = jnp.take_along_axis(ts, best[:, None], axis=1)[:, 0]
            gbest = gact2 + tbest[:, None] * diff
            Hg = Hg + tbest[:, None] * Hd

            nz = jnp.abs(gbest) >= 1e-12
            mask2 = mask2 & nz
            gact2 = jnp.where(mask2, gbest, 0.0)
            theta2 = jnp.where(mask2, jnp.sign(gbest), 0.0)

        # --- full gradient (compact residual form) + full KKT check ---
        maskf = mask2.astype(dt)
        R = jnp.einsum(
            "nc,ncp->np", gact2 * maskf, Dstack, precision=_HI
        ) - Xt
        gr_new = 2.0 * jnp.matmul(R, Dt.T, precision=_HI)   # (N, K)
        is_act2 = _active_mask(idx, mask2, K)
        grm = jnp.where(is_act2, 0.0, gr_new)
        inact_viol = jnp.any(
            jnp.abs(grm) > lam * (1.0 + 1e-4) + 1e-7, axis=1,
        )
        act_viol = jnp.any(
            jnp.abs(2.0 * (Hg - a0sel * maskf) * maskf + lam * theta2)
            * maskf > 1e-4,
            axis=1,
        )
        opt = ~inact_viol & ~act_viol

        # --- freeze done lanes at their pre-refinement state ---
        fz = lambda new, old: jnp.where(done[:, None], old, new)
        mask = fz(mask2, mask0)
        theta = fz(theta2, theta0)
        gact = fz(gact2, gact0)
        gr = fz(grm, gr)
        done = done | opt

    # --- pad the compact state to max_active slots and hand off ---
    pad = max_active - t_unroll
    return (
        jnp.pad(idx, ((0, 0), (0, pad))),
        jnp.pad(mask, ((0, 0), (0, pad))),
        jnp.pad(theta, ((0, 0), (0, pad))),
        jnp.pad(gact, ((0, 0), (0, pad))),
        gr,
        done,
        jnp.zeros((N,), bool),
        jnp.asarray(t_unroll, jnp.int32),
    )


def _fs_unrolled_state_fused(Dt, Xt, A0, lam, *, t_unroll, n_refine,
                             max_active, block=256, interpret=None):
    """`_fs_unrolled_state` computed by the fused Pallas kernel
    (ops/pallas_fs.py): same compact cold-start state, same handoff
    tuple, state resident in VMEM instead of streamed through HBM as
    ~dozens of XLA ops per unrolled step.  `A0` is recomputed in-kernel
    (gr0 = -2 D^T x) — fp-identical module the matmul split; the
    argument is kept for signature parity with the XLA builder."""
    from lyssandra_tpu.ops.pallas_fs import fs_cold_fused

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = Xt.shape[0]
    idx, mask, theta, gact, gr, done = fs_cold_fused(
        Dt.T, Xt.T, lam=float(lam), t_unroll=int(t_unroll),
        n_refine=int(n_refine), block=int(block), interpret=interpret,
    )
    # the kernel emits the UNMASKED gradient; uphold _fs_loop's carried
    # masked-gr invariant here (one compare-reduce per cold start, at
    # compact width Tun — not worth a Mosaic kernel change)
    gr = jnp.where(_active_mask(idx, mask, gr.shape[1]), 0.0, gr)
    pad = ((0, 0), (0, max_active - int(t_unroll)))
    return (
        jnp.pad(idx, pad),
        jnp.pad(mask, pad),
        jnp.pad(theta, pad),
        jnp.pad(gact, pad),
        gr,
        done,
        jnp.zeros((N,), bool),
        jnp.asarray(int(t_unroll), jnp.int32),
    )


def feature_sign(
    D: jax.Array, X: jax.Array, lam: float,
    *, max_active: int = 64, max_iter: int = 100, max_inner: int = 6,
    full_result: bool = False, polish: bool = True,
    compact_stragglers: bool = False, warm_start: int = 4,
    warm_seed: str = "omp",
    auto_capacity: bool = False, max_cg: int = 32, n_activate: int = 1,
    cold_unroll: int | None = None, n_refine: int = 2,
    cold_backend: str | None = None,
):
    """Batched feature-sign search (oracle.feature_sign / oracle.lasso).

    Solves min_g ||x - D g||^2 + lam ||g||_1 per column of X.  Returns the
    dense code matrix Gamma (K, N), or a FeatureSignResult with
    convergence/overflow diagnostics when full_result=True.

    Robustness: feature-sign's active-set swaps can limit-cycle in fp32
    when the solution is dense (small lam, nnz -> p) — outside the
    algorithm's sparse design domain.  With ``polish`` (default), lanes
    that did not reach their KKT conditions are re-solved with FISTA and
    the better objective wins, so every lane converges for every lam.

    ``compact_stragglers``: active-set solvers ride each batch's slowest
    lane — a frozen (done) lane still COMPUTES at full width in every
    later segment.  With this flag, lanes still running after a segment
    are gathered into a narrow power-of-two batch and only those
    continue; results scatter back at the end (identical by construction
    — compaction permutes lanes, never changes a lane's iterations).
    MEASURED NEGATIVE at the config-4 operating point (profile_fs.json,
    r4): 97.8% of lanes converge inside the first 16-iteration segment,
    so the remaining full-width segments are already cheap and the
    per-segment host fetch + narrow-shape compiles cost MORE than they
    save (0.91x).  Off by default; opt in for straggler-heavy regimes
    (small lam / dense solutions where the tail runs many segments).

    ``warm_start`` / ``warm_seed``: active-set seeding.  warm_seed="omp"
    (DEFAULT, warm_start=4 atoms): a batch_omp pass at T=warm_start
    seeds the active set — the greedy coder runs ~3 orders of magnitude
    faster than this loop, and its few-atom support is high-signal, so
    the seed saves ~warm_start outer iterations nearly free: +8.1%
    (config-4 operating point) and +5.6% (coherent regime) on chip,
    identical optima (r6 A/B; pinned by test).  warm_seed="fista"
    (warm_start = FISTA iterations) is the r4-era seed, kept opt-in:
    its unconverged iterate is junk-laden and LOSES 0.88-0.91x against
    the r5+ cached-matvec inner step (ab_fs_design.json) — the r4 1.9x
    expired when the inner step got cheap.  warm_start=0 is the cold
    start, the oracle's literal path.  Same optimum in every mode — the
    KKT exit conditions are identical and the lasso minimizer is
    path-independent; only the iteration count changes.

    ``cold_unroll`` / ``n_refine``: unrolled growing-dimension cold
    start (r8, VERDICT r2 task #1a) — the first ``cold_unroll``
    activations run as statically-unrolled compact-width steps sized to
    the TRUE active dimension (see :func:`_fs_unrolled_state`), each
    with ``n_refine`` fixed refinements, before stragglers hand off to
    the segmented while_loop.  Same optimum (full KKT exit criteria,
    identical); only the iteration cost changes.  Default None =
    backend-dependent: 28 on TPU (the measured chip optimum, 3.3x at
    the config-4 operating point; depth sweep in ab_fs_unroll2.json /
    NOTES_r8), 0 on CPU where the unrolled graph's XLA compile is ~30x
    the while_loop's.

    ``cold_backend``: which builder computes the unrolled cold state.
    Default None = "xla" (r5).  History: the fused VMEM-resident Mosaic
    kernel (ops/pallas_fs.py) measured +33% in r4 and briefly became
    the TPU default, but that win EXPIRED when the scatter-free
    ``_active_mask`` rework made the XLA unroll's 28 per-step
    membership masks 2.7x cheaper — post-rework the two builders are at
    warm-throughput PARITY within session noise (probe_fs28_duel.json:
    interleaved duels disagree in sign across processes, ratios
    0.79/1.06), and the compile/caching economics decide: the XLA
    unroll compiles ~1.7x faster (~540 s vs ~900 s at depth 28) and
    its persistent-cache load is ~30 s/process where pallas'
    trace/lowering-dominated residual stays ~700 s.
    ``cold_backend="pallas"`` keeps the kernel available as a research
    artifact; a once-per-process warning fires before its multi-minute
    uncached compile.  lam is a traced SMEM scalar in both builders:
    lambda sweeps reuse one executable either way.

    ``auto_capacity``: run at a 16-slot active-set width and re-solve
    lanes that overflow it exactly at ``max_active`` — same result (the
    lasso optimum is capacity-independent once capacity covers the
    support; pinned by test).  Default OFF: on chip the (N, 64, 64)
    active-set einsums ride the MXU and the narrow width only shrinks
    already-latency-bound ops while adding an overflow host sync —
    measured 0.92-0.95x (ab_fs_design.json).  It is a big win on CPU
    backends (5x at the config-4 probe shape: O(A^2) scalar matvec work
    really does drop 16x) and cuts per-lane state memory 16x, so it
    stays as the opt-in for CPU meshes and memory-bound regimes.

    ``n_activate`` / ``max_cg``: activation width (top-k KKT violators
    join per outer iteration instead of one) and inner CG matvec budget.
    Same optimum at every setting (path-independence + unchanged KKT
    exit; pinned by test).  Defaults 1/32 follow the chip A/B at the
    config-4 operating point (ab_fs_activate.json, r6): there
    multi-activation LOSES 3.6-6.9x — on a data dictionary the 2nd..kth
    threshold-clearing candidates are usually junk that joins, prunes,
    and re-joins (limit-cycle churn) — and cg12 is a mild 0.96x.  On the
    COHERENT regime (duplicated atoms, e.g. partially-trained online-DL
    dictionaries) the same knobs flip: n_activate=4, max_cg=12 is 2.17x
    (any of a duplicate group is a good join, and the capped warm CG
    stops paying for one straggler lane's ill-conditioned active Gram).
    Opt in when the dictionary is known coherent.

    ``max_inner`` defaults to 6 (r6, ab_fs_inner.json): the inner
    refinement while_loop rides each block's slowest lane, and past ~6
    refinements the survivors are limit-cyclers that the NEXT outer
    iteration (fresh activation + full KKT check) handles better —
    +4.6% at the config-4 operating point, 1.49x on the coherent
    regime, identical optima.  max_inner=3 over-trims (a fresh
    activation genuinely needs a few refinements to settle: 0.65x at
    config-4), and 10-20 only pay straggler tax.
    """
    import numpy as np

    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    Dt, Xt = D.T, X.T
    A0 = jnp.matmul(X.T, D, precision=_HI)
    N = A0.shape[0]
    if cold_unroll is None:
        # backend-dependent default (same pattern as the fused-kernel
        # gate): depth 28 is the chip optimum — config-4 7,078 -> 23,518
        # p/s (3.3x), coherent 2,232 -> 3,576 (1.6x), objective parity
        # ~2e-7 (ab_fs_unroll2.json + NOTES_r8) — but the unrolled graph
        # costs ~160 s of XLA *CPU* compile per shape (vs ~5 s for the
        # while_loop form), so CPU backends default to the plain cold
        # start.  Pass cold_unroll explicitly to override either way.
        cold_unroll = 28 if jax.default_backend() == "tpu" else 0
    if cold_backend is None:
        # "xla" on every backend since r5.  The r4 pallas default
        # (+33%, dirty-stamped grid) EXPIRED with the late-r4
        # scatter-free _active_mask rework: the XLA unroll paid a
        # serialized per-lane scatter per unrolled step and the rework
        # made those masks 2.7x cheaper, while the Mosaic kernel
        # (mask-free one-hot rows in VMEM) gained nothing.  Post-rework
        # warm throughput is PARITY WITHIN SESSION NOISE — interleaved
        # same-process duels disagree in sign across processes
        # (probe_fs28_duel.json ratios 0.79/1.06/...; even identical
        # cached binaries swing ~20-35% between processes here) — so
        # the default follows the compile/caching economics, which are
        # not noise: ~540 s vs ~900 s one-time compile, and a ~30 s vs
        # ~700 s per-process persistent-cache load (the pallas residual
        # is trace/lowering-dominated).  The kernel remains available
        # as cold_backend="pallas" — a documented expired-win research
        # artifact (pallas_select pattern).
        cold_backend = "xla"
    # run in bounded segments per device program: one monolithic
    # while_loop can run minutes of device time on dense problems and
    # trip the TPU worker's kernel watchdog.  Segments are dispatched
    # back-to-back WITHOUT host syncs — once every lane is done a
    # segment's while_loop exits after one cond evaluation.  BUT a
    # zero-trip dispatch is not free over the remote tunnel: 6 surplus
    # segment programs cost 21% of the whole coder at the config-4
    # operating point (seg-probe r5: 49.7k -> 60.4k p/s at max_iter=16,
    # identical Gamma; the escalating default below measures 56.5k,
    # chip A/B, Gamma bitwise equal), so the plan ESCALATES — 16
    # iterations first
    # (fast-converging batches stop cheap), doubling up to 64/program
    # (watchdog bound: worst measured dense regimes run ~20-40 ms per
    # outer iteration, so 64 stays seconds, not minutes).  max_iter=100
    # dispatches 3 programs instead of 7, one executable per distinct
    # size (static bound; see _feature_sign_impl for why not traced).
    seg_plan = []
    left, s = max_iter, min(16, max_iter)
    while left > 0:
        take = min(s, left)
        seg_plan.append(take)
        left -= take
        s = min(2 * s, 64)
    # auto capacity (opt-in, see docstring): run the batch at 16 slots;
    # lanes that genuinely need more overflow and are re-solved at full
    # capacity below (exact — NOT the FISTA fallback), so the result
    # matches the fixed-capacity path.  CPU-measured 5x at the config-4
    # probe (O(A^2) scalar matvecs drop 16x); chip-measured 0.92-0.95x
    # LOSS (the A=64 einsums are already latency-bound, see docstring).
    # At the narrow width warm seeding engages ungated: a <=14-atom seed
    # keeps the active Gram well-conditioned even on coherent
    # dictionaries, where the count gate protecting 64-wide seeding
    # rejects ~all lanes (see _fs_warm_state).
    A_run = 16 if (auto_capacity and max_active > 16) else max_active
    if cold_unroll and cold_unroll > 0:
        # unrolled growing-dimension cold start (see _fs_unrolled_state):
        # the first min(cold_unroll, A_run) activations run as static
        # compact-width steps; stragglers continue in the segments below.
        # Takes precedence over warm seeding — it IS a cold start, just
        # with the small-active-set prefix costed at its true dimension.
        # cold_backend="pallas" computes the same state with the fused
        # VMEM-resident kernel (ops/pallas_fs.py).
        if cold_backend == "pallas":
            _warn_pallas_cold_compile(min(int(cold_unroll), A_run))
        builder = (_fs_unrolled_state_fused if cold_backend == "pallas"
                   else _fs_unrolled_state)
        state = builder(
            Dt, Xt, A0, float(lam),
            t_unroll=min(int(cold_unroll), A_run),
            n_refine=int(n_refine), max_active=A_run,
        )
    elif warm_start and warm_start > 0:
        # warm_seed="fista": warm_start = FISTA iterations of the seed
        # run; "omp": warm_start = greedy atoms from batch_omp (near-free
        # at ~3.4M patches/s; see _fs_omp_seed_iterate)
        if warm_seed == "omp":
            G0t = _fs_omp_seed_iterate(D, Xt, warm_start)
        else:
            G0t = _fs_fista_iterate(D, Xt, A0, float(lam),
                                    n_warm=int(warm_start))
        state = _fs_warm_state(G0t, Dt, Xt, A0, float(lam),
                               max_active=A_run,
                               gate=(A_run == max_active))
    else:
        state = _fs_init(A0, float(lam), A_run)
    state, res = _feature_sign_impl(
        Dt, Xt, A0, float(lam), state,
        max_active=A_run, max_iter=seg_plan[0], max_inner=max_inner,
        max_cg=max_cg, n_activate=n_activate,
    )
    lanes = None            # narrow-batch lane ids (None = full width)
    Xt_n, A0_n = Xt, A0
    for seg_i in seg_plan[1:]:
        if compact_stragglers:
            bad = np.asarray(~state[5])     # still running (overflow
            nbad = int(bad.sum())           # lanes are done+frozen)
            if nbad == 0:
                break
            cur = state[0].shape[0]
            if nbad <= cur // 2:
                # gather still-running lanes into a narrow padded batch;
                # width quantized to powers of two so the whole process
                # compiles at most log2(N/256) narrow executables (each
                # fresh shape costs 30-120 s on the remote compiler)
                cols = np.where(bad)[0]
                width = 256
                while width < nbad:
                    width *= 2
                sel = np.zeros(width, np.int64)
                sel[:nbad] = cols
                selj = jnp.asarray(sel)
                state = tuple(
                    s[selj] if getattr(s, "ndim", 0) >= 1 else s
                    for s in state
                )
                # padding lanes replicate lane cols[0]; mark them done so
                # they freeze immediately
                pad_done = jnp.asarray(np.arange(width) >= nbad)
                state = (
                    state[:5] + (state[5] | pad_done,) + state[6:]
                )
                Xt_n = Xt_n[selj]
                A0_n = A0_n[selj]
                lanes = (
                    cols if lanes is None
                    else np.asarray(lanes)[cols]
                )
        state, res_n = _feature_sign_impl(
            Dt, Xt_n, A0_n, float(lam), state,
            max_active=A_run, max_iter=seg_i, max_inner=max_inner,
            max_cg=max_cg, n_activate=n_activate,
        )
        if lanes is None:
            res = res_n
        else:
            nb = len(lanes)
            res = FeatureSignResult(
                res.Gamma.at[:, jnp.asarray(lanes)].set(
                    res_n.Gamma[:, :nb]
                ),
                res_n.n_iter,
                res.done.at[jnp.asarray(lanes)].set(res_n.done[:nb]),
                res.overflow.at[jnp.asarray(lanes)].set(
                    res_n.overflow[:nb]
                ),
            )
    if A_run < max_active and bool(jnp.any(res.overflow)):
        # reduced-capacity overflow is OUR artifact, not the problem's:
        # re-solve those lanes exactly at the full requested capacity
        # (padded to a power-of-two width to bound compile shapes)
        ovf = np.asarray(res.overflow)
        cols = np.where(ovf)[0]
        nb = len(cols)
        width = 256
        while width < nb:
            width *= 2
        width = min(width, N)
        sel = np.zeros(width, np.int64)
        sel[:nb] = cols
        selj = jnp.asarray(sel)
        sub = feature_sign(
            D, X[:, selj], lam,
            max_active=max_active, max_iter=max_iter,
            max_inner=max_inner, full_result=True, polish=False,
            warm_start=warm_start, warm_seed=warm_seed,
            auto_capacity=False, max_cg=max_cg,
            n_activate=n_activate, cold_unroll=cold_unroll,
            n_refine=n_refine, cold_backend=cold_backend,
        )
        colsj = jnp.asarray(cols)
        res = FeatureSignResult(
            res.Gamma.at[:, colsj].set(sub.Gamma[:, :nb]),
            res.n_iter,
            res.done.at[colsj].set(sub.done[:nb]),
            res.overflow.at[colsj].set(sub.overflow[:nb]),
        )
    if polish:
        res = _fs_polish(D, X, float(lam), res)
    return res if full_result else res.Gamma


@jax.jit
def _fs_polish(D, X, lam, res: FeatureSignResult) -> FeatureSignResult:
    """Device-side FISTA polish of non-converged/overflow lanes.

    The r4-era form gated the polish on ``bool(jnp.any(~done |
    overflow))`` — a HOST FETCH PER CALL that drained the dispatch
    pipeline and paid the ~31 ms tunnel round trip every 2048-lane
    block: at the config-4 operating point (every lane done at the
    depth-28 handoff, polish a no-op) the gate alone cost 41% of the
    whole coder (probe_fs_gate.json: 29.7k p/s with it, 50.2k without,
    bitwise-identical Gamma).  ``lax.cond`` moves the decision onto the
    device — the FISTA branch executes only when some lane needs it,
    and the host never syncs.  Trade: the FISTA-500 program is now
    always part of the compile (one-time per shape) instead of only
    when triggered."""
    bad = ~res.done | res.overflow

    def do(r):
        Gf = fista(D, X, lam, n_iter=500)

        def obj(Gm):
            R = X - jnp.matmul(D, Gm, precision=_HI)
            return jnp.sum(R * R, axis=0) + lam * jnp.sum(
                jnp.abs(Gm), axis=0)

        better = obj(Gf) < obj(r.Gamma)
        take_f = bad & better
        return FeatureSignResult(
            jnp.where(take_f[None, :], Gf, r.Gamma),
            r.n_iter, r.done | take_f, r.overflow & ~take_f,
        )

    return lax.cond(jnp.any(bad), do, lambda r: r, res)


lasso = feature_sign


def feature_sign_scan(
    D: jax.Array, X: jax.Array, lam: float,
    *, max_active: int = 64, max_iter: int = 60, max_inner: int = 6,
    warm_start: int = 0, warm_seed: str = "omp", max_cg: int = 32,
    n_activate: int = 1, cold_unroll: int = 0, n_refine: int = 2,
) -> jax.Array:
    """Pure (traceable) feature-sign: one bounded while_loop, no host
    round-trips — safe to call inside ``lax.scan`` bodies (the online-DL
    epoch scan codes every minibatch on-device with this).  Unconverged
    lanes after ``max_iter`` are finished with a short FISTA polish, also
    on-device.  Returns Gamma (K, N).  ``warm_seed="omp"`` seeds from a
    warm_start-atom XLA-scan OMP pass (traceable, unlike the fused
    kernel route the host-level :func:`feature_sign` seed uses);
    "fista" is the r4-era iterate seed (measured loss since r5).
    ``cold_unroll``: the r8 unrolled growing-dimension cold start
    (traceable — `_fs_unrolled_state` is a pure jitted function, so it
    inlines into scan bodies); explicit opt-in here (no backend
    default) because in-scan economics differ from the dispatch level
    (cf. fs_warm_start flipping sign in-scan) — see OnlineDLConfig
    ``fs_cold_unroll`` for the measured in-scan numbers."""
    Dt, Xt = D.T, X.T
    A0 = jnp.matmul(X.T, D, precision=_HI)
    if cold_unroll and cold_unroll > 0:
        state = _fs_unrolled_state(
            Dt, Xt, A0, lam,
            t_unroll=min(int(cold_unroll), max_active),
            n_refine=int(n_refine), max_active=max_active,
        )
    elif warm_start and warm_start > 0:
        if warm_seed == "omp":
            from lyssandra_tpu.solvers.greedy import _omp_impl

            G0t = _omp_impl(
                D, X, 0.0, T=int(warm_start), eps_mode=False,
                precision=_HI,
            ).dense(D.shape[1]).T
            state = _fs_warm_state(G0t, Dt, Xt, A0, lam,
                                   max_active=max_active)
        else:
            state = _fs_warm_init(
                D, Dt, Xt, A0, lam,
                max_active=max_active, n_warm=int(warm_start),
            )
    else:
        state = _fs_init(A0, lam, max_active)
    _, res = _fs_loop(
        Dt, Xt, A0, lam, state,
        max_active=max_active, max_iter=max_iter, max_inner=max_inner,
        max_cg=max_cg, n_activate=n_activate,
    )
    bad = ~res.done | res.overflow

    def polish(G):
        Gf = _fista_body(D, X, A0.T, lam, G, n_iter=100)

        def obj(Gm):
            R = X - jnp.matmul(D, Gm, precision=_HI)
            return jnp.sum(R * R, axis=0) + lam * jnp.sum(
                jnp.abs(Gm), axis=0
            )

        take_f = bad & (obj(Gf) < obj(G))
        return jnp.where(take_f[None, :], Gf, G)

    # the 100-iteration polish only runs when some lane actually needs it
    # (lax.cond executes one branch — later in training every minibatch
    # converges inside the feature-sign loop and the polish is free)
    return lax.cond(jnp.any(bad), polish, lambda G: G, res.Gamma)


@functools.partial(
    jax.jit, static_argnames=("max_active", "max_steps", "t_stop")
)
def _lars_impl(Dt, Xt, A0, lam, state, *, max_active, max_steps,
               t_stop=0):
    """Batched LARS-lasso homotopy for min ||x - Dg||^2 + lam |g|_1.

    ``t_stop > 0``: T-constrained mode (sklearn Lars/LassoLars
    ``n_nonzero_coefs``-style stopping) — a lane finishes at the first
    join event that would grow its active set beyond ``t_stop`` atoms,
    with coefficients evaluated at that knot.

    Along the regularization path the active coefficients are linear in the
    (decreasing) penalty lt:  g_A(lt) = c_A - lt * w_A  with
    c_A = Gram_A^{-1} a0_A and w_A = Gram_A^{-1} theta_A / 2, and the
    inactive correlations 2(a0 - G_A g_A) are linear in lt too — so each
    homotopy segment is one batched masked solve plus closed-form event
    times (join: |corr| hits lt; leave: coefficient crosses 0).  Fixed
    ``max_steps`` segments, per-lane done masks (SURVEY.md 'LARS / lasso
    wrappers' — the reference delegates to sklearn; this is the native
    batched rebuild; sklearn stays a test oracle).

    TPU lowering (r2, same playbook as feature-sign): the active-set Gram
    comes from GATHERED ATOMS (Dact -> one MXU einsum), and the u/v
    correlation lines use the residual form 2 D^T (x - D_A c) — the old
    per-lane (N, A, K) Gram-row gathers materialized ~1 GB/step at the
    config-4 shape and could not scale past a few thousand lanes.

    Dt = D^T (K, p); Xt = X^T (N, p); A0 = X^T D (N, K).
    """
    step = _lars_make_step(Dt, Xt, A0, lam, max_active, t_stop)
    it0 = state[-1]

    def cond(st):
        *_, done, it = st
        return (it - it0 < max_steps) & ~jnp.all(done)

    st = lax.while_loop(cond, step, state)
    idx, mask, theta, gact, _, lt, done, _ = st
    N, K = A0.shape
    Gd = jnp.zeros((N, K), A0.dtype).at[
        jnp.arange(N)[:, None], idx
    ].add(jnp.where(mask, gact, 0.0))
    return st, (Gd.T, done)


def _lars_make_step(Dt, Xt, A0, lam, max_active, t_stop):
    """One homotopy event step, shared by the solver while_loop and the
    path-recording scan."""
    N, K = A0.shape
    A = max_active
    eyeA = jnp.eye(A, dtype=A0.dtype)
    iotaK = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    BIG = jnp.asarray(3.4e38, A0.dtype)

    def step(st):
        idx, mask, theta, gact, cgw, lt, done, it = st
        maskf = mask.astype(A0.dtype)
        Dact = jnp.take(Dt, idx, axis=0)                  # (N, A, p)
        M = jnp.einsum("nap,nbp->nab", Dact, Dact, precision=_HI)
        M = M * maskf[:, :, None] * maskf[:, None, :]
        Mp = jnp.where(
            (maskf[:, :, None] * maskf[:, None, :]) > 0, M, eyeA[None]
        ) + 1e-6 * eyeA[None]
        a0sel = jnp.take_along_axis(A0, idx, axis=1) * maskf
        # both homotopy solves (c_A and w_A) as ONE two-rhs CG: a batched
        # (N, 64, 64) LU costs ~92 ms on this chip (measured, see
        # masked_solve note) and ran once per homotopy step; CG is exact
        # in <= A iterations and its einsum matvecs vectorize over the
        # rhs axis — same anti-pattern fix as nn_omp's NNLS (r3).
        # Early exit on the residual (r5): the active set holds ~s << A
        # atoms for most of the path, where CG converges in ~s+1
        # iterations — the fixed A+16 trip count spent >80% of its
        # matvecs (the step's dominant M-bandwidth cost) after
        # convergence.  The residual check is also the convergence
        # guard ADVICE r1 asked for: a lane that does NOT converge
        # still runs the full A+16 budget, exactly as before.
        rhs = jnp.stack([a0sel, theta / 2.0], axis=-1)       # (N, A, 2)

        def mv(v):
            return jnp.einsum("nab,nbr->nar", Mp, v, precision=_HI)

        # warm start from the previous knot's solution (r5): the active
        # set changes by ONE atom per homotopy event, so the previous
        # (c_A, w_A) is within a rank-1 correction of the new solution
        # and the early-exit CG converges in a few matvecs instead of ~s
        x0 = cgw * maskf[:, :, None]
        r0 = rhs - mv(x0)

        def cg_step(carry):
            x, r, pv, rs, i = carry
            Mpv = mv(pv)
            al = rs / (jnp.sum(pv * Mpv, axis=1) + 1e-30)    # (N, 2)
            x = x + al[:, None, :] * pv
            r = r - al[:, None, :] * Mpv
            rs2 = jnp.sum(r * r, axis=1)
            pv = r + (rs2 / (rs + 1e-30))[:, None, :] * pv
            return (x, r, pv, rs2, i + 1)

        def cg_cond(carry):
            *_, rs, i = carry
            return (i < A + 16) & jnp.any(rs > 1e-12)

        sol, *_ = lax.while_loop(
            cg_cond, cg_step,
            (x0, r0, r0, jnp.sum(r0 * r0, axis=1),
             jnp.zeros((), jnp.int32)),
        )
        cA = sol[..., 0] * maskf            # g at lt = 0
        wA = sol[..., 1] * maskf            # dg/dlt (negated)

        # inactive correlations, linear in lt: corr_j(lt) = u_j + lt*v_j,
        # residual form: u = 2 d_j^T (x - D_A c), v = 2 d_j^T (D_A w).
        # Both projections and both full-width correlation GEMMs are
        # STACKED into one op each (r5): the separate matmuls were
        # latency-bound at these shapes, so two dispatches cost ~2x one.
        is_act = _active_mask(idx, mask, K)
        cw = jnp.stack([cA, wA], axis=1)                     # (N, 2, A)
        zz = jnp.einsum("nra,nap->nrp", cw, Dact, precision=_HI)
        rz = jnp.stack([Xt - zz[:, 0, :], zz[:, 1, :]], axis=1)
        uv = 2.0 * jnp.einsum("nrp,pk->nrk", rz, Dt.T, precision=_HI)
        u, v = uv[:, 0, :], uv[:, 1, :]

        # join events: u + lt*v = +-lt  =>  lt = u / (+-1 - v)
        ltp = u / jnp.maximum(1.0 - v, 1e-12)
        ltm = u / jnp.minimum(-1.0 - v, -1e-12)
        cand = jnp.where(
            is_act, -BIG, jnp.maximum(
                jnp.where((ltp < lt[:, None] - 1e-6) & (ltp > 0), ltp, -BIG),
                jnp.where((ltm < lt[:, None] - 1e-6) & (ltm > 0), ltm, -BIG),
            )
        )
        lt_join = jnp.max(cand, axis=1)
        k_join = jnp.min(
            jnp.where(cand == lt_join[:, None], iotaK, K), axis=1
        ).astype(jnp.int32)

        # self-healing overdue joins: a near-degenerate leave/join pair
        # can make two events land within the 1e-6 margin, skipping an
        # atom whose crossing then lies in the PAST (|corr(lt)| > lt) —
        # the `< lt - 1e-6` filter would exclude it forever and the rest
        # of the lane's path would silently violate KKT (caught by the
        # r4 per-knot path tests).  Such atoms join IMMEDIATELY at the
        # current lt: no lambda progress, one active-set correction step.
        c_now = jnp.where(is_act, 0.0, u + lt[:, None] * v)
        over = jnp.abs(c_now) - lt[:, None] * (1.0 + 1e-5)
        mx_over = jnp.max(over, axis=1, keepdims=True)
        k_over = jnp.min(
            jnp.where(over == mx_over, iotaK, K), axis=1
        ).astype(jnp.int32)
        has_over = mx_over[:, 0] > 1e-5
        lt_join = jnp.where(has_over, lt, lt_join)
        k_join = jnp.where(has_over, k_over, k_join)

        # leave events: cA - lt*wA = 0 => lt = cA/wA (crossing as lt falls).
        # A just-joined slot (gact == 0: the join wrote a zero
        # coefficient) is EXCLUDED: its segment coefficient is
        # g(l) = wA*(lt_join - l), whose only zero IS the join knot —
        # in exact arithmetic cA/wA = lt_join, and whether the fp32
        # estimate lands inside the 1e-6 exclusion margin is luck.  When
        # it landed below, the solver fired a PHANTOM leave at the join
        # lambda (2 wasted events when the atom rejoins; occasionally a
        # churn cascade ending in a KKT-violating "done" — r8 root
        # cause of the handoff divergence in test_lars_cold_unroll).
        ltz = jnp.where(
            mask & (gact != 0) & (jnp.abs(wA) > 1e-12), cA / jnp.where(
                jnp.abs(wA) > 1e-12, wA, 1.0
            ), -BIG
        )
        ltz = jnp.where((ltz < lt[:, None] - 1e-6) & (ltz > 0), ltz, -BIG)
        lt_leave = jnp.max(ltz, axis=1)
        s_leave = jnp.argmax(jnp.where(ltz == lt_leave[:, None],
                                       1.0, 0.0), axis=1)

        lt_next = jnp.maximum(jnp.maximum(lt_join, lt_leave), lam)
        finished = lt_next <= lam + 1e-9
        prefer_join = lt_join >= lt_leave
        if t_stop:
            # T-constrained stop: the join that would exceed t_stop
            # active atoms finishes the lane AT that join knot (lt_next
            # == lt_join there, so gact_new below is the knot solution)
            hit = (~finished) & prefer_join & (
                jnp.sum(mask, axis=1) >= t_stop
            )
            finished = finished | hit

        gact_new = (cA - lt_next[:, None] * wA) * maskf

        do_join = (~finished) & prefer_join
        do_leave = (~finished) & ~prefer_join

        # join: put k_join into the first free slot
        free = jnp.argmin(mask.astype(jnp.int32), axis=1).astype(jnp.int32)
        no_free = jnp.all(mask, axis=1)
        join_ok = do_join & ~no_free
        slot_hot = (jax.nn.one_hot(free, A, dtype=bool)
                    & join_ok[:, None])
        corr_at = jnp.take_along_axis(u + lt_next[:, None] * v,
                                      k_join[:, None], 1)[:, 0]
        idx2 = jnp.where(slot_hot, k_join[:, None], idx)
        mask2 = mask | slot_hot
        theta2 = jnp.where(slot_hot, jnp.sign(corr_at)[:, None], theta)
        gact2 = jnp.where(slot_hot, 0.0, gact_new)

        # leave: clear the crossing slot
        leave_hot = (jax.nn.one_hot(s_leave, A, dtype=bool)
                     & do_leave[:, None])
        mask3 = mask2 & ~leave_hot
        theta3 = jnp.where(leave_hot, 0.0, theta2)
        gact3 = jnp.where(leave_hot, 0.0, gact2)

        newly_done = finished | (do_join & no_free)
        fz = lambda new, old: jnp.where(done[:, None], old, new)
        return (
            fz(idx2, idx), fz(mask3, mask), fz(theta3, theta),
            fz(gact3, gact),
            jnp.where(done[:, None, None], cgw, sol),
            jnp.where(done, lt, lt_next),
            done | newly_done, it + 1,
        )

    return step


class LarsPath(NamedTuple):
    """Batched regularization-path knots from :func:`lars_path`.

    lambdas: (S+1, N) knot penalties (knot 0 = lambda_max, zero coefs);
    coefs:   (S+1, N, A) compact active-coefficient values per knot;
    idx:     (S+1, N, A) atom ids of the compact slots;
    mask:    (S+1, N, A) slot validity;
    keep:    (S+1, N) True at each lane's LAST row per distinct lambda —
             frozen lanes repeat their final state, and a self-healing
             correction step re-emits a knot at the same lambda with the
             corrected active set; consumers should read kept rows only;
    n_knots: (N,) number of distinct knots per lane (= keep.sum(0)).
    """

    lambdas: jax.Array
    coefs: jax.Array
    idx: jax.Array
    mask: jax.Array
    keep: jax.Array
    n_knots: jax.Array

    def dense(self, K: int) -> jax.Array:
        """(S+1, K, N) dense coefficient path (small problems only)."""
        S, N, A = self.coefs.shape
        out = jnp.zeros((S, N, K), self.coefs.dtype)
        out = out.at[
            jnp.arange(S)[:, None, None],
            jnp.arange(N)[None, :, None],
            self.idx,
        ].add(jnp.where(self.mask, self.coefs, 0.0))
        return jnp.moveaxis(out, 1, 2)


@functools.partial(
    jax.jit, static_argnames=("max_active", "max_steps", "t_stop")
)
def _lars_path_impl(Dt, Xt, A0, lam, state, *, max_active, max_steps,
                    t_stop=0):
    """Fixed-trip path recording: scan ``max_steps`` homotopy events,
    emitting every knot (sklearn lars_path's coef_path analogue,
    batched)."""
    step = _lars_make_step(Dt, Xt, A0, lam, max_active, t_stop)

    def body(st, _):
        _, mask0, _, _, _, lt0, done0, _ = st
        st2 = step(st)
        idx, mask, _, gact, _, lt, done, _ = st2
        # an overdue-join healing step joins at UNCHANGED lambda: both
        # the knots it supersedes and itself are off-path (the late
        # joiner sits at 0 where the true path has it nonzero) — flag
        # for exclusion from `keep`
        healed = (
            (lt == lt0) & ~done0
            & (jnp.sum(mask, 1) > jnp.sum(mask0, 1))
        )
        return st2, (lt, gact, idx, mask, healed)

    st, (lts, gacts, idxs, masks, heals) = lax.scan(
        body, state, None, length=max_steps
    )
    return st, (lts, gacts, idxs, masks, heals)


def _lars_init(A0, lam, A):
    """lt = lambda_max = max 2|a0|; activate the argmax atom."""
    N, K = A0.shape
    iotaK = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    c0 = 2.0 * jnp.abs(A0)
    lt0 = jnp.max(c0, axis=1)
    k0 = jnp.min(jnp.where(c0 == lt0[:, None], iotaK, K), axis=1)
    k0 = k0.astype(jnp.int32)
    idx = jnp.zeros((N, A), jnp.int32).at[:, 0].set(k0)
    mask = jnp.zeros((N, A), bool).at[:, 0].set(True)
    theta = jnp.zeros((N, A), A0.dtype).at[:, 0].set(
        jnp.sign(jnp.take_along_axis(A0, k0[:, None], 1)[:, 0])
    )
    gact = jnp.zeros((N, A), A0.dtype)
    cgw = jnp.zeros((N, A, 2), A0.dtype)    # CG warm start (c_A, w_A)
    done0 = lt0 <= lam          # target penalty at/above lambda_max: g = 0
    return (idx, mask, theta, gact, cgw, lt0, done0,
            jnp.zeros((), jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("t_unroll", "max_active", "t_stop")
)
def _lars_unrolled_state(Dt, Xt, A0, lam, *, t_unroll, max_active,
                         t_stop=0):
    """Unrolled growing-dimension homotopy cold start (the nn_omp /
    feature-sign r7-r8 trick applied to LARS — VERDICT r2 task #7).

    The homotopy activates at most one atom per event, so the first ~s
    knots of a lane whose solution has s nonzeros (mean ~4.5 at the
    operating points) carry an active set of size <= s — yet
    :func:`_lars_make_step` pays full (N, A=64, p) atom gathers,
    (N, 64, 64) Gram einsums and an up-to-A+16-step CG per event.  This
    path Python-unrolls the first ``t_unroll`` events with every shape
    static at the TRUE active dimension: event c's two-rhs direction
    solve is a (c+1)-iteration CG on (N, c, c) systems, and the compact
    geometry (Dstack, Gsel, a0sel) grows by exactly one slot per event
    (a leave masks its slot; slots are not reused — capacity waste
    bounded by t_unroll << max_active).

    Event semantics are copied verbatim from ``_lars_make_step`` (join /
    leave / overdue-join healing / t_stop), so the path — and therefore
    the knot solutions — matches the wide form up to f32 reduction
    order.  Returns a ``_lars_impl`` state tuple padded to
    ``max_active`` slots; stragglers continue in the segmented
    while_loop.

    Compile-time cost: the graph grows O(t_unroll^2) ops (tens of
    seconds of XLA CPU compile per shape at depth ~12).  The policy is
    backend-gated (``lars``: cold_unroll=None -> 12 on TPU, 0 on CPU
    where the compile tax outweighs the win).
    """
    N, K = A0.shape
    dt = A0.dtype
    rows = jnp.arange(N)[:, None]
    iotaK = lax.broadcasted_iota(jnp.int32, (N, K), 1)
    BIG = jnp.asarray(3.4e38, dt)

    # --- _lars_init at compact width 1 ---
    c0 = 2.0 * jnp.abs(A0)
    lt = jnp.max(c0, axis=1)
    k0 = jnp.min(jnp.where(c0 == lt[:, None], iotaK, K), axis=1)
    k0 = k0.astype(jnp.int32)
    done = lt <= lam
    idx = k0[:, None]
    mask = jnp.ones((N, 1), bool)
    theta = jnp.sign(
        jnp.take_along_axis(A0, k0[:, None], 1)
    )
    gact = jnp.zeros((N, 1), dt)
    dk = jnp.take(Dt, k0, axis=0)                       # (N, p)
    Dstack = dk[:, None, :]
    Gsel = jnp.sum(dk * dk, axis=1)[:, None, None]
    a0sel = jnp.take_along_axis(A0, idx, axis=1)
    cgw = jnp.zeros((N, 1, 2), dt)

    for t in range(t_unroll):
        c = idx.shape[1]
        maskf = mask.astype(dt)
        eyec = jnp.eye(c, dtype=dt)
        pairm = maskf[:, :, None] * maskf[:, None, :]
        Mp = jnp.where(pairm > 0, Gsel * pairm, eyec[None]) \
            + 1e-6 * eyec[None]
        a0m = a0sel * maskf
        rhs = jnp.stack([a0m, theta / 2.0], axis=-1)     # (N, c, 2)

        def mv(v, Mp=Mp):
            return jnp.einsum("nab,nbr->nar", Mp, v, precision=_HI)

        # two-rhs CG, exact in <= c iterations (+1 fp32 headroom), warm
        # from the previous knot's solution — fully unrolled (static c)
        x = cgw * maskf[:, :, None]
        r = rhs - mv(x)
        pv = r
        rs = jnp.sum(r * r, axis=1)                      # (N, 2)
        for _ in range(c + 1):
            Mpv = mv(pv)
            al = rs / (jnp.sum(pv * Mpv, axis=1) + 1e-30)
            x = x + al[:, None, :] * pv
            r = r - al[:, None, :] * Mpv
            rs2 = jnp.sum(r * r, axis=1)
            pv = r + (rs2 / (rs + 1e-30))[:, None, :] * pv
            rs = rs2
        sol = x * maskf[:, :, None]
        cA = sol[..., 0]
        wA = sol[..., 1]

        # inactive correlation lines, residual form at compact width
        cw = jnp.stack([cA, wA], axis=1)                 # (N, 2, c)
        zz = jnp.einsum("nrc,ncp->nrp", cw, Dstack, precision=_HI)
        rz = jnp.stack([Xt - zz[:, 0, :], zz[:, 1, :]], axis=1)
        uv = 2.0 * jnp.einsum("nrp,pk->nrk", rz, Dt.T, precision=_HI)
        u, v = uv[:, 0, :], uv[:, 1, :]

        is_act = _active_mask(idx, mask, K)

        # join events (verbatim _lars_make_step semantics)
        ltp = u / jnp.maximum(1.0 - v, 1e-12)
        ltm = u / jnp.minimum(-1.0 - v, -1e-12)
        cand = jnp.where(
            is_act, -BIG, jnp.maximum(
                jnp.where((ltp < lt[:, None] - 1e-6) & (ltp > 0),
                          ltp, -BIG),
                jnp.where((ltm < lt[:, None] - 1e-6) & (ltm > 0),
                          ltm, -BIG),
            )
        )
        lt_join = jnp.max(cand, axis=1)
        k_join = jnp.min(
            jnp.where(cand == lt_join[:, None], iotaK, K), axis=1
        ).astype(jnp.int32)

        # self-healing overdue joins
        c_now = jnp.where(is_act, 0.0, u + lt[:, None] * v)
        over = jnp.abs(c_now) - lt[:, None] * (1.0 + 1e-5)
        mx_over = jnp.max(over, axis=1, keepdims=True)
        k_over = jnp.min(
            jnp.where(over == mx_over, iotaK, K), axis=1
        ).astype(jnp.int32)
        has_over = mx_over[:, 0] > 1e-5
        lt_join = jnp.where(has_over, lt, lt_join)
        k_join = jnp.where(has_over, k_over, k_join)

        # leave events (gact == 0 slots excluded — see _lars_make_step's
        # phantom-leave note)
        ltz = jnp.where(
            mask & (gact != 0) & (jnp.abs(wA) > 1e-12), cA / jnp.where(
                jnp.abs(wA) > 1e-12, wA, 1.0
            ), -BIG
        )
        ltz = jnp.where((ltz < lt[:, None] - 1e-6) & (ltz > 0),
                        ltz, -BIG)
        lt_leave = jnp.max(ltz, axis=1)
        s_leave = jnp.argmax(
            jnp.where(ltz == lt_leave[:, None], 1.0, 0.0), axis=1
        )

        lt_next = jnp.maximum(jnp.maximum(lt_join, lt_leave), lam)
        finished = lt_next <= lam + 1e-9
        prefer_join = lt_join >= lt_leave
        if t_stop:
            hit = (~finished) & prefer_join & (
                jnp.sum(mask, axis=1) >= t_stop
            )
            finished = finished | hit

        gact_new = (cA - lt_next[:, None] * wA) * maskf

        do_join = (~finished) & prefer_join
        do_leave = (~finished) & ~prefer_join

        # leave: clear the crossing slot at compact width
        leave_hot = (jax.nn.one_hot(s_leave, c, dtype=bool)
                     & do_leave[:, None])
        mask_upd = mask & ~leave_hot
        theta_upd = jnp.where(leave_hot, 0.0, theta)
        gact_upd = jnp.where(leave_hot, 0.0, gact_new)

        # join: ALWAYS append one fresh slot (inert unless join fires on
        # a live lane) — static shapes, no slot reuse
        live = do_join & ~done
        livef = live.astype(dt)
        corr_at = jnp.take_along_axis(u + lt_next[:, None] * v,
                                      k_join[:, None], 1)[:, 0]
        dkj = jnp.take(Dt, k_join, axis=0) * livef[:, None]
        cross = jnp.einsum("ncp,np->nc", Dstack, dkj, precision=_HI)
        dkk = jnp.sum(dkj * dkj, axis=1)
        Gsel = jnp.concatenate(
            [
                jnp.concatenate([Gsel, cross[:, :, None]], axis=2),
                jnp.concatenate(
                    [cross[:, None, :], dkk[:, None, None]], axis=2
                ),
            ],
            axis=1,
        )
        Dstack = jnp.concatenate([Dstack, dkj[:, None, :]], axis=1)
        a0k = jnp.sum(dkj * Xt, axis=1)

        # freeze done lanes (their fresh slot stays inert); grow state
        fz = lambda new, old: jnp.where(done[:, None], old, new)
        idx = jnp.concatenate(
            [idx, jnp.where(live, k_join, 0)[:, None]], axis=1
        )
        mask = jnp.concatenate(
            [fz(mask_upd, mask), live[:, None]], axis=1
        )
        theta = jnp.concatenate(
            [fz(theta_upd, theta),
             (jnp.sign(corr_at) * livef)[:, None]], axis=1
        )
        gact = jnp.concatenate(
            [fz(gact_upd, gact), jnp.zeros((N, 1), dt)], axis=1
        )
        a0sel = jnp.concatenate([a0sel, a0k[:, None]], axis=1)
        cgw = jnp.concatenate(
            [jnp.where(done[:, None, None], cgw, sol),
             jnp.zeros((N, 1, 2), dt)], axis=1
        )
        lt = jnp.where(done, lt, lt_next)
        done = done | finished

    # --- pad the compact state to max_active slots and hand off ---
    pad = max_active - idx.shape[1]
    return (
        jnp.pad(idx, ((0, 0), (0, pad))),
        jnp.pad(mask, ((0, 0), (0, pad))),
        jnp.pad(theta, ((0, 0), (0, pad))),
        jnp.pad(gact, ((0, 0), (0, pad))),
        jnp.pad(cgw, ((0, 0), (0, pad), (0, 0))),
        lt,
        done,
        jnp.asarray(t_unroll, jnp.int32),
    )


def lars(
    D: jax.Array, X: jax.Array, lam: float = 0.0,
    *, n_nonzero_coefs: int | None = None,
    max_active: int = 64, max_steps: int = 256,
    full_result: bool = False, polish: bool = True,
    cold_unroll: int | None = None,
):
    """Batched LARS-lasso (homotopy) solver for the lasso objective
    ||x - D g||^2 + lam ||g||_1 — same optimum as feature_sign, reached by
    tracing the regularization path from lambda_max down to lam.

    ``n_nonzero_coefs=T``: T-constrained mode (the sklearn
    Lars/LassoLars ``n_nonzero_coefs`` stopping the reference's lasso
    wrapper exposes) — each lane stops at the first join event that
    would grow its active set past T atoms and returns the knot
    solution there (<= T nonzeros); lam (default 0) is the floor if the
    path exhausts first.  Polish is skipped in this mode (the FISTA
    fallback solves the lam-penalized objective, not the T-constrained
    one).  fp32 caveat: a lane whose path needed an overdue-join heal
    (a missed crossing rejoined late) can stop with an inactive atom
    slightly above the boundary — rare (property-tested bound), and the
    active coefficients remain the exact lasso solution OF that active
    set at the stop penalty.

    fp32 homotopy is path-sensitive: a ~1-ulp perturbation can reorder two
    nearby events and strand a lane short of its KKT point.  With
    ``polish`` (default), lanes whose final KKT residual violates lam get
    re-solved with FISTA and the better objective wins.

    ``cold_unroll``: run the first t homotopy events as statically-
    unrolled compact-width steps (see :func:`_lars_unrolled_state`)
    before the segmented while_loop — same event semantics,
    ~true-active-dimension cost for the early knots.  Default None =
    backend-dependent 12 on TPU / 0 on CPU (the unrolled graph's CPU
    compile is ~30x the while_loop's).  Chip A/B at p=64/K=1024
    (NOTES_r8): T-mode (n_nonzero_coefs=8) 27.4k -> 88.9k p/s (3.25x);
    planted-sparse lam=0.15 (nnz ~6) 6.2k -> 9.0k (1.46x, exact
    objective parity); dense random-signal lam=0.15 (nnz ~47) only
    1.13x at depth 12 / 1.22x at 24 — there the per-event floor is the
    width-INDEPENDENT (N, K) correlation + event-scan work, which no
    active-set compaction touches (the fused-kernel rewrite is the
    lever for that regime).

    ``polish=False`` caveat: the homotopy direction solve is a fixed
    (max_active+16)-step unpreconditioned f32 CG with no convergence
    check (exact in <= A steps only in exact arithmetic); on
    ill-conditioned active Grams (highly coherent atoms) the direction
    can be inaccurate and bend the path with nothing downstream to catch
    it — the KKT+FISTA polish IS the convergence check.  Leave polish on
    unless the dictionary is known well-conditioned.
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    t_stop = 0 if n_nonzero_coefs is None else int(n_nonzero_coefs)
    if t_stop:
        max_active = max(max_active, t_stop + 1)
        polish = False
    G = jnp.matmul(D.T, D, precision=_HI)
    A0 = jnp.matmul(X.T, D, precision=_HI)
    # segmented launches (<= 32 homotopy steps each) dispatched without
    # per-segment host syncs — a finished segment's while_loop exits after
    # one cond check (see feature_sign)
    seg = min(32, max_steps)
    if cold_unroll is None:
        cold_unroll = 12 if jax.default_backend() == "tpu" else 0
    if cold_unroll and cold_unroll > 0:
        # unrolled growing-dimension cold start: the first homotopy
        # events run as static compact-width steps (_lars_unrolled_state)
        state = _lars_unrolled_state(
            D.T, X.T, A0, float(lam),
            t_unroll=min(int(cold_unroll), max_active - 1),
            max_active=max_active, t_stop=t_stop,
        )
    else:
        state = _lars_init(A0, float(lam), max_active)
    Gamma = done = None
    for _ in range((max_steps + seg - 1) // seg):
        state, (Gamma, done) = _lars_impl(
            D.T, X.T, A0, float(lam), state,
            max_active=max_active, max_steps=seg, t_stop=t_stop,
        )
    if polish:
        Gamma, done = _lars_polish(D, X, G, A0, float(lam), Gamma, done)
    return (Gamma, done) if full_result else Gamma


@jax.jit
def _lars_polish(D, X, G, A0, lam, Gamma, done):
    """Device-side lasso-mode LARS polish — the same ``lax.cond``
    rework as :func:`_fs_polish`: the old ``bool(jnp.any(bad))`` host
    fetch drained the dispatch pipeline once per call (measured 41% of
    the whole feature-sign coder at the config-4 operating point,
    probe_fs_gate.json; the LARS epilogue had the identical pattern)."""
    gr = 2.0 * (jnp.matmul(G, Gamma, precision=_HI) - A0.T)
    act = jnp.abs(Gamma) > 1e-8
    viol = jnp.where(
        act, jnp.abs(gr + lam * jnp.sign(Gamma)),
        jnp.maximum(jnp.abs(gr) - lam, 0.0),
    ).max(axis=0)
    bad = ~done | (viol > 1e-2 * jnp.maximum(lam, 1.0))

    def do(args):
        Gamma, done = args
        Gf = fista(D, X, lam, n_iter=500)

        def obj(Gm):
            R = X - jnp.matmul(D, Gm, precision=_HI)
            return jnp.sum(R * R, axis=0) + lam * jnp.sum(
                jnp.abs(Gm), axis=0
            )

        take = bad & (obj(Gf) < obj(Gamma))
        return jnp.where(take[None, :], Gf, Gamma), done | take

    return lax.cond(jnp.any(bad), do, lambda a: a, (Gamma, done))


def lars_path(
    D: jax.Array, X: jax.Array, lam: float = 0.0,
    *, n_nonzero_coefs: int | None = None,
    max_active: int = 64, max_steps: int = 64,
) -> LarsPath:
    """Batched regularization path (sklearn ``lars_path`` analogue,
    method='lasso'): every homotopy knot from lambda_max down to ``lam``
    (or until ``n_nonzero_coefs`` atoms are active), for all N signals at
    once.  Knot 0 is (lambda_max, all-zero); see :class:`LarsPath`.

    Fixed ``max_steps`` trip count (path recording needs every event, so
    there is no early exit — keep max_steps modest; lanes that finish
    early repeat their final knot, count in ``n_knots``).
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    t_stop = 0 if n_nonzero_coefs is None else int(n_nonzero_coefs)
    if t_stop:
        max_active = max(max_active, t_stop + 1)
    A0 = jnp.matmul(X.T, D, precision=_HI)
    state = _lars_init(A0, float(lam), max_active)
    idx0, mask0, _, gact0, _, lt0, done0, _ = state
    _, (lts, gacts, idxs, masks, heals) = _lars_path_impl(
        D.T, X.T, A0, float(lam), state,
        max_active=max_active, max_steps=max_steps, t_stop=t_stop,
    )
    lambdas = jnp.concatenate([lt0[None], lts], axis=0)
    coefs = jnp.concatenate([gact0[None], gacts], axis=0)
    idx = jnp.concatenate([idx0[None], idxs], axis=0)
    mask = jnp.concatenate([mask0[None], masks], axis=0)
    # keep the LAST row per distinct lambda (frozen lanes repeat their
    # final lambda), minus knots touched by a healing correction: a heal
    # joins an overdue atom at unchanged lambda, so the knot(s) it
    # supersedes AND the heal knot itself (late joiner still at 0) are
    # off the true path — valid knots resume at the next real event
    healed = jnp.concatenate(
        [jnp.zeros((1, lambdas.shape[1]), bool), heals], axis=0
    )
    off_path = healed | jnp.concatenate(
        [healed[1:], jnp.zeros((1, lambdas.shape[1]), bool)], axis=0
    )
    keep = jnp.concatenate([
        lambdas[:-1] != lambdas[1:],
        jnp.ones((1, lambdas.shape[1]), bool),
    ], axis=0) & ~off_path
    n_knots = jnp.sum(keep, axis=0).astype(jnp.int32)
    return LarsPath(lambdas, coefs, idx, mask, keep, n_knots)


lasso_lars = lars  # reference-style alias (sklearn LassoLars wrapper name)


def _fista_body(D, X, A0, lam, g0, n_iter: int):
    """Traceable FISTA core: warm-starts from g0, power-iterated step bound
    (no eigendecomposition — cheap enough to run inside scan bodies).
    A0 = D^T X (K, N).

    Gradients use the residual form 2 D^T (D y - x): 4pK flops per lane
    per iteration vs the Gram form's 2K^2 — 8x cheaper at p=64, K=1024
    (the batch_omp refresh='auto' rule; overcomplete dictionaries always
    have 2p < K).  lmax(D^T D) = sigma_max(D)^2 comes from the same
    two-matmul operator, so the K x K Gram is never formed."""
    p, K = D.shape

    def gram_mv(v):
        return jnp.matmul(
            D.T, jnp.matmul(D, v, precision=_HI), precision=_HI
        )

    v = jnp.ones((K,), D.dtype) / jnp.sqrt(K)

    def pw(v, _):
        w = gram_mv(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-12), None

    v, _ = lax.scan(pw, v, None, length=16)
    lmax = jnp.dot(v, gram_mv(v))
    # power iteration underestimates lmax; 1.1 margin keeps L an upper bound
    L = 2.2 * lmax + 1e-6

    def shrink(v, t):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - t, 0.0)

    def step(carry, _):
        g, y, t = carry
        grad = 2.0 * (gram_mv(y) - A0)
        gnew = shrink(y - grad / L, lam / L)
        tnew = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        ynew = gnew + ((t - 1.0) / tnew) * (gnew - g)
        return (gnew, ynew, tnew), None

    (g, _, _), _ = lax.scan(step, (g0, g0, jnp.ones(())), None, length=n_iter)
    return g


@functools.partial(jax.jit, static_argnames=("n_iter",))
def fista(
    D: jax.Array, X: jax.Array, lam: float, n_iter: int = 200
) -> jax.Array:
    """FISTA for the same objective ||x - Dg||^2 + lam ||g||_1.

    A cheap, fully-batched alternative coder (Beck & Teboulle 2009); useful
    as the coding step of online dictionary learning when feature-sign's
    exact active-set solve isn't needed.  Returns Gamma (K, N).
    """
    D = jnp.asarray(D, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    A0 = jnp.matmul(D.T, X, precision=_HI)
    g0 = jnp.zeros((D.shape[1], X.shape[1]), D.dtype)
    return _fista_body(D, X, A0, lam, g0, n_iter)
