"""Interleaved duel: packed vs unpacked fused group-OMP kernel (r5).

Why: the clean-tree ab_group_fused regen INVERTED the r4 ordering
(r4: packed_b256 527k > fused_b256 453k; r5 clean: fused 550k >
packed 440k) — sequential cells on a ~20%-session-swing backend
cannot justify the `packed=True` default either way (the same lesson
probe_fs28_duel.json taught for the feature-sign cold builders).
This probe alternates packed/unpacked passes in ONE quiet process
through the public route.

    python -m benchmarks.probe_group_duel [--rounds 7]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

P, K, T, N, BLOCKS = 64, 1024, 4, 32768, 4


def main():
    rounds = 7
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    import jax.numpy as jnp

    from lyssandra_tpu import solvers

    load0 = os.getloadavg()
    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Dj = jnp.asarray(D, jnp.float32)
    X = rng.standard_normal((P, N * BLOCKS))
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    blocks = [jnp.asarray(X[:, i * N:(i + 1) * N], jnp.float32)
              for i in range(BLOCKS)]
    groups = np.repeat(np.arange(K // 4), 4)

    def one_pass(packed):
        chks = [jnp.sum(solvers.group_omp(
            Dj, Xb, groups, 4, dense=False, packed=packed).err)
            for Xb in blocks]
        float(np.asarray(jnp.sum(jnp.stack(chks))))

    times = {"packed": [], "unpacked": []}
    for packed in (True, False):            # warm/compile
        one_pass(packed)
    for r in range(rounds):
        for name, packed in (("packed", True), ("unpacked", False)):
            t0 = time.perf_counter()
            one_pass(packed)
            times[name].append(round(time.perf_counter() - t0, 4))
        print(r, {k: v[-1] for k, v in times.items()}, flush=True)

    load1 = os.getloadavg()
    res = {"shape": f"p={P} K={K} N={N}x{BLOCKS} gs=4 T=4",
           "protocol": (f"{rounds} interleaved rounds, public route, "
                        "compact dense=False, one process, warm"),
           "host_loadavg_5m": [round(load0[1], 2), round(load1[1], 2)],
           "host_quiet": load0[1] < 1.5 and load1[1] < 1.5}
    for k, v in times.items():
        sv = sorted(v)
        res[k] = {"pass_seconds": v,
                  "median_pps": round(BLOCKS * N / sv[len(sv) // 2], 1),
                  "best_pps": round(BLOCKS * N / sv[0], 1)}
    res["median_ratio_packed_over_unpacked"] = round(
        res["packed"]["median_pps"] / res["unpacked"]["median_pps"], 3)
    print(json.dumps(res, indent=1))
    from benchmarks import write_result

    print("wrote", write_result("probe_group_duel", res))


if __name__ == "__main__":
    main()
