"""Per-phase decomposition of feature-sign search at the config-4 shape.

    python -m benchmarks.profile_fs [--quick]

VERDICT r1 #4: feature-sign ran at 1.47k patches/s (vs greedy's 4400x
oracle) with no committed profile.  This measures, at the config-4
operating point (p=192 color patches, K=1024, lam=0.15, unit-norm):

  1. phase probes at operating shapes (4096 lanes, A=64): the full-K
     gradient matmuls, the Dact gather + active Gram build, one
     warm-started CG solve, one line-search step;
  2. the convergence profile: per-16-iteration-segment done counts and
     wall time (the straggler-idle evidence: a segment's cost is ~flat
     in the done fraction because frozen lanes still compute);
  3. the 32k-lane probe A/B: compact_stragglers on vs off through the
     encoder route (4096-lane blocks), plus objective identity.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")

LAM = 0.15


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _best_of(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _color_patches(n, seed=1):
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=n, seed=seed).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    return X


def main(quick=False):
    import jax
    import jax.numpy as jnp

    from lyssandra_tpu.ops.dictionaries import init_dictionary
    from lyssandra_tpu.solvers.encoder import SparseEncoder
    from lyssandra_tpu.solvers.lasso import (
        _feature_sign_impl, _fs_init, feature_sign,
    )

    N_probe = 8192 if quick else 32768
    Nb = 4096
    A = 64
    out = {"shape": dict(p=192, K=1024, lam=LAM, lanes_probe=N_probe,
                         block=Nb), "device": str(jax.devices()[0])}

    X = _color_patches(N_probe)
    K = 1024
    D = np.asarray(init_dictionary(jnp.asarray(X), K, "data", 0))
    Dj = jnp.asarray(D)
    Xb = jnp.asarray(X[:, :Nb])

    # ---- 1. phase probes at (Nb, A) shapes -----------------------------
    # in-program repetition (dependent lax.scan, REPS iterations) — a
    # single dispatch+fetch costs ~31 ms over the tunnel, which is more
    # than any of these ops: per-op time = loop_time / REPS
    REPS = 64
    Dt, Xt = Dj.T, Xb.T
    A0 = jnp.matmul(Xb.T, Dj, precision=jax.lax.Precision.HIGHEST)
    _sync(A0)

    def repeat_ms(fn, x0):
        f = jax.jit(
            lambda x: jax.lax.scan(
                lambda c, _: (fn(c), None), x, None, length=REPS
            )[0]
        )
        _sync(f(x0))
        return 1e3 * _best_of(lambda: _sync(f(x0))) / REPS

    rng = np.random.default_rng(0)
    g_full = jnp.asarray(rng.standard_normal((Nb, K)) * 0.01, jnp.float32)

    def grad_step(g):
        R = jnp.matmul(g, Dt, precision=jax.lax.Precision.HIGHEST) - Xt
        gr = 2.0 * jnp.matmul(R, Dt.T,
                              precision=jax.lax.Precision.HIGHEST)
        return g + 1e-6 * gr                    # dependent chain

    out["phase_grad_full_ms"] = repeat_ms(grad_step, g_full)

    idx = jnp.asarray(rng.integers(0, K, (Nb, A)), jnp.int32)

    def gather_gram_step(idx):
        Dact = jnp.take(Dt, idx, axis=0)
        M = jnp.einsum("nap,nbp->nab", Dact, Dact,
                       precision=jax.lax.Precision.HIGHEST)
        return (idx + M[:, :1, 0].astype(jnp.int32) * 0) % K

    out["phase_gather_gram_ms"] = repeat_ms(gather_gram_step, idx)

    Dact = jnp.take(Dt, idx, axis=0)
    M = jnp.einsum("nap,nbp->nab", Dact, Dact,
                   precision=jax.lax.Precision.HIGHEST)
    rhs = jnp.asarray(rng.standard_normal((Nb, A)), jnp.float32)

    def cg8_step(rhs):
        def op(v):
            return jnp.einsum("nab,nb->na", M, v,
                              precision=jax.lax.Precision.HIGHEST) + 1e-6 * v

        x = jnp.zeros_like(rhs)
        r = rhs - op(x)
        pv, rs = r, jnp.sum(r * r, axis=1)
        for _ in range(8):                      # 8 matvecs, warm-start regime
            Mp = op(pv)
            al = rs / (jnp.sum(pv * Mp, axis=1) + 1e-30)
            x = x + al[:, None] * pv
            r = r - al[:, None] * Mp
            rs2 = jnp.sum(r * r, axis=1)
            pv = r + (rs2 / (rs + 1e-30))[:, None] * pv
            rs = rs2
        return rhs + 1e-6 * x                   # dependent chain

    out["phase_cg8_ms"] = repeat_ms(cg8_step, rhs)

    ts = jnp.linspace(0.0, 1.0, A + 1)[None, :].repeat(Nb, 0)

    def linesearch_r4_step(gact):
        # the PRE-r5 line search: every candidate evaluated against the
        # active Gram — (A+1) Gram matvecs per refinement.  Kept as a
        # probe so the r5 rewrite's win stays measured.
        gnew = gact * 0.7
        diff = gnew - gact
        gt = gact[:, None, :] + ts[..., None] * diff[:, None, :]
        Mg = jnp.einsum("nab,ncb->nca", M, gt,
                        precision=jax.lax.Precision.HIGHEST)
        quad = jnp.sum(gt * Mg, axis=2)
        best = jnp.argmin(quad, axis=1)
        return gact + 1e-6 * best[:, None].astype(jnp.float32)

    out["phase_linesearch_r4_ms"] = repeat_ms(linesearch_r4_step, rhs)

    def linesearch_r5_step(st):
        # the r5 form (solvers/lasso.py inner_step) at steady state: Hg
        # is CARRIED (maintained by affine updates along the accepted
        # segment), so a refinement costs ONE exact Gram matvec (Hnew)
        # plus two dot products; only the piecewise-linear l1 term is
        # evaluated per candidate — vs A+1 Gram matvecs in the r4 form.
        gact, Hg = st
        gnew = gact * 0.7
        Hnew = jnp.einsum("nab,nb->na", M, gnew,
                          precision=jax.lax.Precision.HIGHEST)
        diff, Hd = gnew - gact, Hnew - Hg
        b = 2.0 * jnp.einsum("na,na->n", diff, Hg,
                             precision=jax.lax.Precision.HIGHEST)
        c = jnp.einsum("na,na->n", diff, Hd,
                       precision=jax.lax.Precision.HIGHEST)
        l1 = jnp.sum(
            jnp.abs(gact[:, None, :] + ts[..., None] * diff[:, None, :]),
            axis=2,
        )
        obj = ts * b[:, None] + ts * ts * c[:, None] + LAM * l1
        best = jnp.argmin(obj, axis=1)
        # index i of linspace(0, 1, A+1) is step i/A (NOT i/(A+1)): read
        # the argmin point off the grid so the iterated state is exactly
        # the grid minimizer (timing unaffected either way)
        tb = jnp.take_along_axis(ts, best[:, None], axis=1)
        return (gact + tb * diff, Hg + tb * Hd)

    Hg0 = jnp.einsum("nab,nb->na", M, rhs,
                     precision=jax.lax.Precision.HIGHEST)
    f_r5 = jax.jit(
        lambda st: jax.lax.scan(
            lambda c, _: (linesearch_r5_step(c), None), st, None,
            length=REPS,
        )[0]
    )
    _sync(f_r5((rhs, Hg0))[0])
    out["phase_linesearch_r5_ms"] = (
        1e3 * _best_of(lambda: _sync(f_r5((rhs, Hg0))[0])) / REPS
    )

    # ---- 2. convergence profile: per-segment done counts + time --------
    state = _fs_init(A0, LAM, A)
    # compile the (Nb,) segment executable OUTSIDE the timed region (one
    # throwaway segment; state is immutable so the profile below still
    # starts from init) — remote cold-compile variance is 50-270 s and
    # an unwarmed seg0 cell conflates it into the wall (r11: 8.2 vs
    # 14.9 s for the same work)
    _d0, _ = _feature_sign_impl(
        Dt, Xt, A0, LAM, state, max_active=A, max_iter=16, max_inner=6)
    _sync(_d0[0])
    segs = []
    for s in range(7):
        t0 = time.perf_counter()
        state, res = _feature_sign_impl(
            Dt, Xt, A0, LAM, state, max_active=A, max_iter=16,
            max_inner=6,          # the r6 default (ab_fs_inner.json)
        )
        nd = int(np.asarray(jnp.sum(state[5])))   # sync + count
        segs.append({
            "segment": s, "seconds": round(time.perf_counter() - t0, 4),
            "done": nd, "frac_done": round(nd / Nb, 4),
        })
        if nd == Nb:
            break
    out["segments_block4096"] = segs

    # ---- 3. 32k probe: compaction A/B through the encoder route --------
    # cold_backend pinned to "xla": this section measures COMPACTION,
    # and the shipped pallas default's depth-28 Mosaic compile is
    # ~1,900 s one-time per shape in a fresh process (ab_fs_fused.json)
    # — the pallas end-to-end numbers live in that artifact
    def run(compact):
        enc = SparseEncoder("lasso", {"lam": LAM,
                                      "compact_stragglers": compact,
                                      "cold_backend": "xla"},
                            check_atoms=False)
        G = enc.encode(X, D)
        _sync(G)
        return G

    for compact in (False, True):
        run(compact)                                  # warm/compile
        t = _best_of(lambda: run(compact), reps=2)
        G = run(compact)
        R = jnp.asarray(X) - Dj @ G
        obj = float(jnp.sum(R * R) + LAM * jnp.sum(jnp.abs(G)))
        key = "compacted" if compact else "baseline"
        out[key] = {
            "seconds": round(t, 3),
            "patches_per_sec": round(N_probe / t, 1),
            "objective": obj,
        }
    out["speedup"] = round(
        out["compacted"]["patches_per_sec"]
        / out["baseline"]["patches_per_sec"], 3
    )
    out["objective_identical_rel"] = abs(
        out["compacted"]["objective"] - out["baseline"]["objective"]
    ) / abs(out["baseline"]["objective"])

    # ---- 4. coherent-regime post-handoff floor (VERDICT r3 task #1c) ---
    # The r4 grid (ab_fs_fused.json) leaves the coherent regime at
    # ~3.5k p/s with only 21% of lanes done at the depth-28 handoff —
    # the time is in the segmented full-width while_loop.  Decompose:
    # (a) per-segment wall + done counts at the production 2048-lane
    # block, from the depth-28 handoff state; (b) the per-outer-
    # iteration dependent op chain measured at the SAME lane count
    # (grad + gather/gram + CG + r5 line search); (c) implied per-outer
    # wall vs that chain = how much headroom a fused segment kernel
    # could even target.
    from benchmarks.ab_fs_activate import make_coherent
    from lyssandra_tpu.solvers.lasso import _fs_unrolled_state

    Nc = 2048
    Dc, Xc = make_coherent(Nc)
    Dct, Xct = Dc.T, Xc.T
    A0c = jnp.matmul(Xct, Dc, precision=jax.lax.Precision.HIGHEST)
    _sync(A0c)
    coh = {"lanes": Nc, "handoff_depth": 28}
    t0 = time.perf_counter()
    st = _fs_unrolled_state(Dct, Xct, A0c, LAM, t_unroll=28,
                            n_refine=2, max_active=A)
    nd = int(np.asarray(jnp.sum(st[5])))
    coh["handoff_cold_seconds"] = round(time.perf_counter() - t0, 1)
    coh["done_at_handoff"] = round(nd / Nc, 4)
    # compile the (2048,) segment executable OUTSIDE the timed region
    # (one throwaway segment from a copy of the handoff state) so
    # seg0's wall is warm — the whole point is per-outer-iteration cost
    _st_warm, _ = _feature_sign_impl(
        Dct, Xct, A0c, LAM, st, max_active=A, max_iter=16, max_inner=6)
    _sync(_st_warm[0])
    segs_c = []
    for s in range(12):
        t0 = time.perf_counter()
        st, res_c = _feature_sign_impl(
            Dct, Xct, A0c, LAM, st, max_active=A, max_iter=16,
            max_inner=6,
        )
        nd = int(np.asarray(jnp.sum(st[5])))
        segs_c.append({
            "segment": s, "seconds": round(time.perf_counter() - t0, 4),
            "done": nd, "frac_done": round(nd / Nc, 4),
        })
        if nd == Nc:
            break
    coh["segments_block2048"] = segs_c
    # phase chain at the same 2048 lanes (warm, in-program repetition)
    rng2 = np.random.default_rng(3)
    g2 = jnp.asarray(rng2.standard_normal((Nc, K)) * 0.01, jnp.float32)
    idx2 = jnp.asarray(rng2.integers(0, K, (Nc, A)), jnp.int32)
    rhs2 = jnp.asarray(rng2.standard_normal((Nc, A)), jnp.float32)
    Dact2 = jnp.take(Dct, idx2, axis=0)
    M2 = jnp.einsum("nap,nbp->nab", Dact2, Dact2,
                    precision=jax.lax.Precision.HIGHEST)

    def grad2(g):
        R = jnp.matmul(g, Dct, precision=jax.lax.Precision.HIGHEST) - Xct
        return g + 1e-6 * 2.0 * jnp.matmul(
            R, Dct.T, precision=jax.lax.Precision.HIGHEST)

    def gg2(i):
        Da = jnp.take(Dct, i, axis=0)
        Mm = jnp.einsum("nap,nbp->nab", Da, Da,
                        precision=jax.lax.Precision.HIGHEST)
        return (i + Mm[:, :1, 0].astype(jnp.int32) * 0) % K

    def cg2(r):
        def op(v):
            return jnp.einsum("nab,nb->na", M2, v,
                              precision=jax.lax.Precision.HIGHEST) + 1e-6 * v
        x = jnp.zeros_like(r)
        rr = r - op(x)
        pv, rs = rr, jnp.sum(rr * rr, axis=1)
        for _ in range(8):
            Mp = op(pv)
            al = rs / (jnp.sum(pv * Mp, axis=1) + 1e-30)
            x = x + al[:, None] * pv
            rr = rr - al[:, None] * Mp
            rs2 = jnp.sum(rr * rr, axis=1)
            pv = rr + (rs2 / (rs + 1e-30))[:, None] * pv
            rs = rs2
        return r + 1e-6 * x

    def scatter_dense2(ga):
        # the PRE-r11 dense() scatter-add the solver used to pay once
        # per outer iteration: (Nc, A) slot values into an (Nc, K) zero
        # canvas.  Removed by the gathered-residual gradient (see
        # grad_gathered2 below); kept as a probe so the removed cost
        # stays measured.
        z = jnp.zeros((Nc, K), jnp.float32)
        d = z.at[jnp.arange(Nc)[:, None], idx2].add(ga)
        return ga + 1e-6 * jnp.take_along_axis(d, idx2, axis=1)

    def scatter_isactive2(ga):
        # the PRE-r11 is_active scatter (2x per outer) — replaced by
        # the fused compare-reduce in solvers/lasso.py::_active_mask
        z = jnp.zeros((Nc, K), bool).at[
            jnp.arange(Nc)[:, None], idx2
        ].max(ga > 0)
        return ga + 1e-6 * jnp.take_along_axis(
            z.astype(jnp.float32), idx2, axis=1)

    def isact_reduce2(ga):
        # the r11 _active_mask form: (Nc, A, K) compare-reduce, fusable
        kk = jnp.arange(K, dtype=idx2.dtype)[None, None, :]
        z = jnp.any((idx2[:, :, None] == kk) & (ga > 0)[:, :, None],
                    axis=1)
        return ga + 1e-6 * jnp.take_along_axis(
            z.astype(jnp.float32), idx2, axis=1)

    def grad_gathered2(ga):
        # the r11 gradient: D g from the GATHERED active atoms (no
        # (Nc, K) dense code, no scatter) + the correlation GEMM
        R = jnp.einsum("na,nap->np", ga, Dact2,
                       precision=jax.lax.Precision.HIGHEST) - Xct
        gr = 2.0 * jnp.matmul(R, Dct.T,
                              precision=jax.lax.Precision.HIGHEST)
        return ga + 1e-6 * jnp.take_along_axis(gr, idx2, axis=1)

    def ls5_2048(st):
        # the r5 carried-Hg line search at 2048 lanes (one exact Gram
        # matvec + two dots + the (A+1)-candidate l1 sum) — 0.9 ms at
        # 4096 lanes in section 1, re-measured here because the chain
        # must be at a single lane count
        gact, Hg = st
        gnew = gact * 0.7
        Hnew = jnp.einsum("nab,nb->na", M2, gnew,
                          precision=jax.lax.Precision.HIGHEST)
        diff, Hd = gnew - gact, Hnew - Hg
        ts2l = jnp.linspace(0.0, 1.0, A + 1)[None, :].repeat(Nc, 0)
        b = 2.0 * jnp.einsum("na,na->n", diff, Hg,
                             precision=jax.lax.Precision.HIGHEST)
        c = jnp.einsum("na,na->n", diff, Hd,
                       precision=jax.lax.Precision.HIGHEST)
        l1 = jnp.sum(
            jnp.abs(gact[:, None, :] + ts2l[..., None] * diff[:, None, :]),
            axis=2,
        )
        obj = ts2l * b[:, None] + ts2l * ts2l * c[:, None] + LAM * l1
        best = jnp.argmin(obj, axis=1)
        # same grid-index fix as ls5 above: index i -> step i/A
        tb = jnp.take_along_axis(ts2l, best[:, None], axis=1)
        return (gact + tb * diff, Hg + tb * Hd)

    Hg02 = jnp.einsum("nab,nb->na", M2, rhs2,
                      precision=jax.lax.Precision.HIGHEST)
    f_ls2 = jax.jit(
        lambda st: jax.lax.scan(
            lambda cc, _: (ls5_2048(cc), None), st, None, length=REPS,
        )[0]
    )
    _sync(f_ls2((rhs2, Hg02))[0])
    ls2_ms = 1e3 * _best_of(lambda: _sync(f_ls2((rhs2, Hg02))[0])) / REPS

    coh["phase_ms_at_2048"] = {
        "grad_full": repeat_ms(grad2, g2),
        "grad_gathered": repeat_ms(grad_gathered2, rhs2),
        "gather_gram": repeat_ms(gg2, idx2),
        "cg8": repeat_ms(cg2, rhs2),
        "linesearch_r5": ls2_ms,
        "isact_reduce": repeat_ms(isact_reduce2, rhs2),
        "scatter_dense_removed": repeat_ms(scatter_dense2, rhs2),
        "scatter_isactive_removed": repeat_ms(scatter_isactive2, rhs2),
    }
    ph = coh["phase_ms_at_2048"]
    # chain per outer iteration at the r6 defaults: 1 gathered-residual
    # grad + activation, 1 active-set rebuild (gather+gram), up to
    # max_inner=6 refinements each paying a warm CG + the r5 line
    # search, plus ONE _active_mask compare-reduce (the KKT check's —
    # its masked gradient is CARRIED as the next activation score, r11)
    scat = ph["isact_reduce"]
    ref = ph["cg8"] + ph["linesearch_r5"]
    chain_lo = ph["grad_gathered"] + ph["gather_gram"] + ref + scat
    chain_hi = (ph["grad_gathered"] + ph["gather_gram"] + 6 * ref
                + scat)
    coh["scat_removed_per_outer_ms"] = round(
        ph["scatter_dense_removed"] + 2 * ph["scatter_isactive_removed"]
        + ph["isact_reduce"] - scat, 3)
    coh["per_outer_chain_ms"] = {"1_refine": round(chain_lo, 3),
                                 "6_refine": round(chain_hi, 3)}
    if segs_c:
        # implied per-outer wall from the first full segment (16 iters)
        coh["per_outer_actual_ms_seg0"] = round(
            1e3 * segs_c[0]["seconds"] / 16.0, 3)
    out["coherent_floor"] = coh

    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, "profile_fs.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
