"""Throughput sweep: EVERY solver at a standard shape on the chip.

    python -m benchmarks.solver_sweep

Shape: p=64, K=1024, N=32768 (T=8 / lam=0.15 on unit-norm signals), the
north-star operating point.  Timing per bench.py discipline: warm every
buffer, dispatch blocks back-to-back, one scalar sync; best of 3.
Emits benchmarks/results/solver_throughput.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

P, K, T, N, BLOCKS = 64, 1024, 8, 32768, 4
RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def main():
    load_start = os.getloadavg()

    import jax.numpy as jnp

    from lyssandra_tpu import solvers

    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Dj = jnp.asarray(D, jnp.float32)
    X = rng.standard_normal((P, N * BLOCKS))
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    blocks = [
        jnp.asarray(X[:, i * N : (i + 1) * N], jnp.float32)
        for i in range(BLOCKS)
    ]
    groups = np.repeat(np.arange(K // 4), 4)        # 256 groups of 4
    from lyssandra_tpu.solvers.encoder import SparseEncoder

    _enc_lasso = SparseEncoder("lasso", {"lam": 0.15}, check_atoms=False)
    _enc_lars = SparseEncoder("lars", {"lam": 0.15}, check_atoms=False)

    solvers_to_run = {
        "batch_omp(T=8)": lambda Xb: solvers.batch_omp(
            Dj, Xb, T, dense=False).err,
        "omp_eps(T=16,eps)": lambda Xb: solvers.batch_omp(
            Dj, Xb, 16, eps=0.05, dense=False).err,
        "nn_omp(T=8)": lambda Xb: solvers.nn_omp(
            Dj, jnp.abs(Xb), T, dense=False).err,
        # compact route + in-program checksum (VERDICT r3 task #7): the
        # old row scattered a dense (K, 32k) Gamma and abs-summed it
        # EAGERLY — protocol cost that under-reported the solver 1.5x
        # (350.9k recorded vs 527k through the compact route,
        # group_omp_fused.json)
        "group_omp(T=4,gs=4)": lambda Xb: solvers.group_omp(
            Dj, Xb, groups, 4, dense=False).err,
        # convex routes go through the encoder: active-set solvers ride
        # each block's slowest straggler, so production blocks at the
        # measured optimum (2048, ab_fs_block.json) — a raw one-32k-lane
        # call understates the deliverable throughput ~2x
        "feature_sign(lam=.15)": lambda Xb: jnp.sum(
            jnp.abs(_enc_lasso.encode(Xb, Dj)), axis=0),
        "lars(lam=.15)": lambda Xb: jnp.sum(
            jnp.abs(_enc_lars.encode(Xb, Dj)), axis=0),
        "fista(lam=.15,300it)": lambda Xb: jnp.sum(
            jnp.abs(solvers.fista(Dj, Xb, 0.15, n_iter=300)), axis=0),
        "llc(knn=5)": lambda Xb: jnp.sum(
            jnp.abs(solvers.llc(Dj, Xb, knn=5)), axis=0),
        "threshold(soft)": lambda Xb: jnp.sum(
            jnp.abs(solvers.threshold_code(Dj, Xb, 0.02)), axis=0),
    }

    def measure(fn, n_protocol=3, repeat_if_faster_than_s=2.0):
        """bench.py discipline (r5, VERDICT r4 #1/#7): each protocol run
        warms every block then takes best-of-3 back-to-back dispatch +
        one scalar sync; rows whose timed pass is cheap (< ~2 s) run the
        whole protocol n_protocol times and report the MEDIAN with the
        raw runs recorded — single protocol runs of the group-OMP row
        historically swung 176k-842k p/s across sessions (probe_group.json)
        while the solver itself was unchanged."""
        def one():
            for Xb in blocks:
                float(np.asarray(jnp.sum(fn(Xb))))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                chks = [jnp.sum(fn(Xb)) for Xb in blocks]
                float(np.asarray(jnp.sum(jnp.stack(chks))))
                best = min(best, time.perf_counter() - t0)
            return best
        runs = [one()]
        if runs[0] < repeat_if_faster_than_s:
            runs += [one() for _ in range(n_protocol - 1)]
        rates = sorted(round(BLOCKS * N / b, 1) for b in runs)
        return rates[len(rates) // 2], rates

    out, out_runs = {}, {}
    for name, fn in solvers_to_run.items():
        try:
            out[name], out_runs[name] = measure(fn)
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAILED: {str(e)[:120]}"
        print(name, out[name], out_runs.get(name), flush=True)

    # --- convex-row self-explanation (VERDICT r3 task #3) ---
    # The convex rows sit ~3 orders below greedy here while the config-4
    # shape (p=192 real color patches) reaches 23.5k p/s.  Record WHY per
    # solver: solution density (mean nnz), convergence fraction, and the
    # cold-unroll handoff fraction at THIS shape — lam=0.15 on p=64
    # unit-norm random data admits many more above-threshold correlations
    # (corr std = 1/sqrt(p) = 0.125 vs the 0.075 activation bar) than
    # structured patches do, so solutions are denser and lanes outrun the
    # depth-28 unrolled cold start into the wide while_loop.
    from lyssandra_tpu.solvers.lasso import feature_sign, lars
    import jax

    _HI = jax.lax.Precision.HIGHEST
    stats = {}
    Xs = blocks[0][:, :2048]          # one production-sized convex block
    fs_res = feature_sign(Dj, Xs, 0.15, full_result=True)
    A0 = jnp.matmul(Xs.T, Dj, precision=_HI)
    from lyssandra_tpu.solvers.lasso import _fs_unrolled_state
    hand = _fs_unrolled_state(Dj.T, Xs.T, A0, 0.15, t_unroll=28,
                              n_refine=2, max_active=64)
    stats["feature_sign(lam=.15)"] = {
        "mean_nnz": float(np.asarray(
            (jnp.abs(fs_res.Gamma) > 0).sum(0).mean())),
        "done_frac": float(np.asarray(fs_res.done.mean())),
        "overflow_frac": float(np.asarray(fs_res.overflow.mean())),
        "done_at_unroll28_handoff": float(np.asarray(hand[5].mean())),
    }
    print("fs stats", stats["feature_sign(lam=.15)"], flush=True)
    lr = lars(Dj, Xs, lam=0.15)
    stats["lars(lam=.15)"] = {
        "mean_nnz": float(np.asarray((jnp.abs(lr) > 0).sum(0).mean())),
    }

    # matched-sparsity row: find the lam whose mean nnz matches the
    # config-4 regime (~4.5) and measure the full protocol there — is
    # the 1300x convex/greedy spread a dense-solution regime fact or a
    # tuning gap?  (lam is a TRACED argument on every fs path: the probe
    # sweep reuses one executable.)
    probe = {}
    target = 4.5
    for lam in (0.25, 0.35, 0.5, 0.7):
        Gp = feature_sign(Dj, Xs, lam)
        probe[lam] = float(np.asarray((jnp.abs(Gp) > 0).sum(0).mean()))
    print("nnz probe", probe, flush=True)
    lam_m = min(probe, key=lambda lam: abs(probe[lam] - target))
    enc_m = SparseEncoder("lasso", {"lam": lam_m}, check_atoms=False)
    name_m = f"feature_sign(lam={lam_m},matched_nnz={probe[lam_m]:.1f})"
    try:
        out[name_m], out_runs[name_m] = measure(
            lambda Xb: jnp.sum(jnp.abs(enc_m.encode(Xb, Dj)), axis=0))
    except Exception as e:  # noqa: BLE001
        out[name_m] = f"FAILED: {str(e)[:120]}"
    print(name_m, out[name_m], flush=True)

    load_end = os.getloadavg()
    from benchmarks import stamp
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "solver_throughput.json"),
              "w") as f:
        json.dump(stamp({
            "shape": f"p={P} K={K} N={N}x{BLOCKS}",
            "patches_per_sec": out,
            "protocol_runs": out_runs,
            "host_loadavg_5m_at_start": round(load_start[1], 2),
            "host_loadavg_5m_at_end": round(load_end[1], 2),
            "host_quiet": load_start[1] < 1.5 and load_end[1] < 1.5,
            "convex_stats": stats,
            "fs_nnz_by_lam": probe,
            "protocol_notes": {
                "group_omp": ("compact route (dense=False) + in-program "
                              "err checksum since r4; the r3 row paid a "
                              "dense (K,N) eager scatter + abs-sum and "
                              "under-read the solver 1.5x"),
                "group_omp_variance": (
                    "single protocol runs of this row swing ~1.8x within "
                    "one quiet process and hit 176k (3.7x low) in the r4 "
                    "end-of-round capture with no code change — "
                    "probe_group.json isolates it: quiet-chip median 536k, "
                    "runs 479-842k, solver identical.  Hence the r5 "
                    "median-of-3-protocols + host-load fields here."),
                "convex": ("encoder route, 2048-lane blocks "
                           "(ab_fs_block.json optimum); slow rows "
                           "(>~2 s/pass) keep a single protocol run — "
                           "their 42 s timed passes average out the "
                           "session noise the fast rows need medians for"),
            },
        }), f, indent=2)


if __name__ == "__main__":
    main()
