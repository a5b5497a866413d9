"""Where do the NON-kernel ~90% of a feature_sign call go? (r5,
follow-on to profile_fs_kernel.json.)

profile_fs_kernel measured the depth-28 cold builder at 0.0715 s /
16,384 lanes (229k p/s kernel-only) while the full feature_sign route
takes 0.53-0.78 s for the same lanes (duel passes) — ~90% of the coder
is OUTSIDE the builder.  Prime suspect: the polish gate
(`bool(jnp.any(~done | overflow))`) is a HOST FETCH PER 2048-lane
CALL, the exact serializing anti-pattern CLAUDE.md documents for
correctness guards — it drains the pipeline and pays the ~31 ms tunnel
round trip 8x per 16k-lane pass.  Control: `polish=False` short-
circuits before the fetch with identical results at the config-4
operating point (every lane is done at the depth-28 handoff, so the
polish is a no-op there).

Interleaved rounds of polish=True / polish=False passes, one process.

    python -m benchmarks.probe_fs_gate [--rounds 5]
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

    def one_pass(polish):
        outs = [feature_sign(Dd, b, LAM, warm_start=0, cold_unroll=28,
                             cold_backend="xla", polish=polish)
                for b in blocks]
        _sync(jnp.concatenate(outs, axis=1))
        return outs

    # identical results at this operating point (all lanes done at the
    # depth-28 handoff -> polish is a no-op): verify, don't assume
    Ga = jnp.concatenate(one_pass(True), axis=1)
    Gb = jnp.concatenate(one_pass(False), axis=1)
    max_diff = float(np.asarray(jnp.max(jnp.abs(Ga - Gb))))

    times = {"polish_gate": [], "no_gate": []}
    for r in range(rounds):
        for name, pol in (("polish_gate", True), ("no_gate", False)):
            t0 = time.perf_counter()
            one_pass(pol)
            times[name].append(round(time.perf_counter() - t0, 4))
        print(r, {k: v[-1] for k, v in times.items()}, flush=True)

    load1 = os.getloadavg()
    res = {"shape": f"config4 regime N={N} block={BLOCK} lam={LAM} "
                    "cold=xla_un28",
           "protocol": (f"{rounds} interleaved rounds polish=True vs "
                        "False (False skips ONLY the per-call host-"
                        "fetch gate at this operating point)"),
           "gamma_max_abs_diff": max_diff,
           "host_loadavg_5m": [round(load0[1], 2), round(load1[1], 2)],
           "host_quiet": load0[1] < 1.5 and load1[1] < 1.5}
    for k, v in times.items():
        sv = sorted(v)
        res[k] = {"pass_seconds": v,
                  "median_pps": round(N / sv[len(sv) // 2], 1),
                  "best_pps": round(N / sv[0], 1)}
    res["gate_cost_ratio"] = round(
        res["polish_gate"]["median_pps"] / res["no_gate"]["median_pps"],
        3)
    if "--label" in sys.argv:
        res["label"] = sys.argv[sys.argv.index("--label") + 1]

    # append-mode: keep the pre-fix evidence next to post-fix reruns
    # (after the _fs_polish lax.cond rework the "polish_gate" arm IS
    # gate-free and the ratio should sit at ~1.0)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "probe_fs_gate.json")
    runs = []
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        runs = prior.get("runs") or [{
            k: prior[k] for k in
            ("protocol", "gamma_max_abs_diff", "host_quiet", "label",
             "polish_gate", "no_gate", "gate_cost_ratio") if k in prior
        }]
    runs.append(res)
    out = {"shape": res["shape"], "runs": runs,
           "gate_cost_ratio_per_run":
               [r["gate_cost_ratio"] for r in runs]}
    print(json.dumps(out, indent=1))
    from benchmarks import write_result

    print("wrote", write_result("probe_fs_gate", out))


if __name__ == "__main__":
    main()
