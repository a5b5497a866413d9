"""Does the encoder's 2048-lane convex block optimum survive the r5
dispatch-path fixes?  (Re-measure dependent tunings after any hot-loop
rewrite — CLAUDE.md; this round's rewrite was OURS.)

The 2048 default (ab_fs_block.json, r6) was measured when every
feature_sign call paid a host-fetch polish gate (~28 ms) and 7 segment
programs — fixed per-call costs that penalized small blocks.  Both are
gone (probe_fs_gate.json; escalating traced-bound segments), so the
straggler-isolation side of the trade may now afford narrower blocks.

Interleaved rounds over block sizes, config-4 regime (lam 0.15) and
matched-sparsity regime (lam 0.7) — lam is traced, so both regimes
share executables; each new BLOCK SIZE still compiles its own
(~minutes, remote).

    python -m benchmarks.probe_fs_block_r5 [--rounds 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SIZES = (512, 1024, 2048, 4096)


def main():
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    import jax.numpy as jnp

    from benchmarks.ab_fs_activate import make_config4, _sync
    from lyssandra_tpu.solvers.lasso import feature_sign

    load0 = os.getloadavg()
    N = 16384
    Dd, Xd = make_config4(N)

    def one_pass(block, lam):
        outs = [feature_sign(Dd, Xd[:, i:i + block], lam,
                             warm_start=0, cold_unroll=28,
                             cold_backend="xla")
                for i in range(0, N, block)]
        _sync(jnp.concatenate(outs, axis=1))
        return outs

    res = {"shape": f"config4 panel N={N}",
           "host_loadavg_5m_start": round(load0[1], 2)}
    for lam, tag in ((0.15, "lam0.15_nnz4.5"), (0.7, "lam0.7_nnz3.0")):
        # warm/compile every size first (fresh shapes cost minutes on
        # the remote compiler; excluded from timing)
        for b in SIZES:
            t0 = time.perf_counter()
            one_pass(b, lam)
            print(f"warm {tag} b{b}: {time.perf_counter() - t0:.1f} s",
                  flush=True)
        times = {b: [] for b in SIZES}
        for r in range(rounds):
            for b in SIZES:
                t0 = time.perf_counter()
                one_pass(b, lam)
                times[b].append(round(time.perf_counter() - t0, 4))
            print(tag, r, {b: v[-1] for b, v in times.items()},
                  flush=True)
        res[tag] = {
            f"block{b}": {
                "passes": v,
                "median_pps": round(N / sorted(v)[len(v) // 2], 1),
            }
            for b, v in times.items()
        }
    res["host_loadavg_5m_end"] = round(os.getloadavg()[1], 2)
    res["host_quiet"] = (load0[1] < 1.5
                         and res["host_loadavg_5m_end"] < 1.5)
    print(json.dumps(res, indent=1))
    from benchmarks import write_result

    print("wrote", write_result("probe_fs_block_r5", res))


if __name__ == "__main__":
    main()
