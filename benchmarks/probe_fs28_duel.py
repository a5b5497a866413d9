"""Decisive same-process interleaved duel: XLA vs Pallas feature-sign
cold start at depth 28, config-4 regime (VERDICT r4 #5 follow-up).

Why: the r5 clean-tree ab_fs_fused grid REVERSED the r4 conclusion
(xla_un28 30.3k vs pal_un28 26.3k p/s, where r4 read 21.1k vs 28.1k)
— consistent with the late-r4 scatter-free `_active_mask` rework
having sped the XLA unroll's 28 per-step membership masks 2.7x while
the Mosaic kernel (mask-free one-hot rows in VMEM) gained nothing.
But the grid also showed a non-monotone pal_un24 cell (16.7k between
23.6k and 26.3k), i.e. possible mid-grid session drift.  Sequential
grids cannot adjudicate a ~15% gap on a backend with ~20% session
swing; INTERLEAVED passes in one process can.

Protocol: warm both variants, then R rounds of alternating
xla-pass / pal-pass (each pass = 8 x 2048-lane dispatch blocks, one
checksum sync); per-variant median and best are reported.  Run with
JAX_COMPILATION_CACHE_DIR=.jax_cache to reuse the regen's executables.

    python -m benchmarks.probe_fs28_duel [--rounds 5]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    import jax.numpy as jnp

    from benchmarks.ab_fs_activate import make_config4, _sync
    from lyssandra_tpu.solvers.lasso import feature_sign

    load0 = os.getloadavg()
    N, BLOCK, LAM = 16384, 2048, 0.15
    Dd, Xd = make_config4(N)
    blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
              for i in range(N // BLOCK)]

    def one_pass(backend):
        outs = [feature_sign(Dd, b, LAM, warm_start=0, cold_unroll=28,
                             cold_backend=backend)
                for b in blocks]
        _sync(jnp.concatenate(outs, axis=1))

    times = {"xla": [], "pallas": []}
    for backend in ("xla", "pallas"):       # warm: compile/cache-load
        t0 = time.perf_counter()
        one_pass(backend)
        print(f"warm {backend}: {time.perf_counter() - t0:.1f} s",
              flush=True)
    for r in range(rounds):
        for backend in ("xla", "pallas"):
            t0 = time.perf_counter()
            one_pass(backend)
            times[backend].append(round(time.perf_counter() - t0, 4))
        print(r, {k: v[-1] for k, v in times.items()}, flush=True)

    load1 = os.getloadavg()
    res = {"shape": f"config4 regime N={N} block={BLOCK} lam={LAM}",
           "protocol": (f"{rounds} interleaved rounds of alternating "
                        "xla/pallas passes, one process, warm"),
           "host_loadavg_5m": [round(load0[1], 2), round(load1[1], 2)],
           "host_quiet": load0[1] < 1.5 and load1[1] < 1.5}
    for k, v in times.items():
        sv = sorted(v)
        res[k] = {
            "pass_seconds": v,
            "median_pps": round(N / sv[len(sv) // 2], 1),
            "best_pps": round(N / sv[0], 1),
        }
    res["median_ratio_pal_over_xla"] = round(
        res["pallas"]["median_pps"] / res["xla"]["median_pps"], 3)

    # accumulate runs: single interleaved duels turned out to disagree
    # in SIGN across processes (0.79x then 1.06x, both quiet — even
    # identical cached binaries swing ~20-35% between processes on this
    # backend), so the artifact keeps every run and summarizes the
    # distribution; the per-run interleaving still controls
    # within-process drift.
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "probe_fs28_duel.json")
    runs = []
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        runs = prior.get("runs") or [{
            k: prior[k] for k in
            ("protocol", "host_loadavg_5m", "host_quiet", "xla",
             "pallas", "median_ratio_pal_over_xla") if k in prior
        }]
    runs.append(res)
    ratios = [r["median_ratio_pal_over_xla"] for r in runs]
    out = {
        "shape": res["shape"],
        "runs": runs,
        "ratio_pal_over_xla_per_run": ratios,
        "conclusion": (
            "warm throughput is PARITY WITHIN SESSION NOISE: "
            "interleaved duels disagree in sign across processes "
            f"(ratios {ratios}); the default stays 'xla' on the "
            "compile/caching economics (~540 s vs ~900 s one-time "
            "compile; ~30 s vs ~700 s per-process persistent-cache "
            "load - the pallas residual is trace/lowering-dominated)"),
    }
    print(json.dumps(out, indent=1))
    from benchmarks import write_result

    print("wrote", write_result("probe_fs28_duel", out))


if __name__ == "__main__":
    main()
