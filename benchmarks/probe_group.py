"""Isolated quiet-chip rerun of the sweep's group-OMP row (VERDICT r4 #1).

Reproduces benchmarks/solver_sweep.py's protocol exactly (same shape, same
compact route, warm + best-of-3, 4x32k blocks) but as the ONLY work in the
process, with host-load provenance, repeated as median-of-3 protocol runs.

    python -m benchmarks.probe_group [--xla] [--unpacked]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

P, K, T, N, BLOCKS = 64, 1024, 4, 32768, 4
RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def main():
    import jax.numpy as jnp

    from lyssandra_tpu import solvers

    fused = "--xla" not in sys.argv
    packed = "--unpacked" not in sys.argv

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
    groups = np.repeat(np.arange(K // 4), 4)

    def fn(Xb):
        return solvers.group_omp(
            Dj, Xb, groups, 4, dense=False, fused=fused, packed=packed
        ).err

    def measure():
        for Xb in blocks:
            float(np.asarray(jnp.sum(fn(Xb))))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            chks = [jnp.sum(fn(Xb)) for Xb in blocks]
            float(np.asarray(jnp.sum(jnp.stack(chks))))
            best = min(best, time.perf_counter() - t0)
        return round(BLOCKS * N / best, 1)

    runs = [measure() for _ in range(3)]
    load = os.getloadavg()
    out = {
        "row": f"group_omp(T=4,gs=4) fused={fused} packed={packed}",
        "shape": f"p={P} K={K} N={N}x{BLOCKS}",
        "protocol": "sweep-identical: compact route, warm, best-of-3; "
        "median of 3 protocol runs",
        "runs_patches_per_sec": runs,
        "median_patches_per_sec": sorted(runs)[1],
        "host_loadavg_1m_at_start": round(load[0], 2),
        "host_loadavg_5m_at_start": round(load[1], 2),
        "host_quiet": load[1] < 1.5,
        "committed_sweep_row": 176195.1,
        "prior_committed_row": 660180.0,
    }
    print(json.dumps(out, indent=1))
    from benchmarks import stamp

    with open(os.path.join(RESULTS_DIR, "probe_group.json"), "w") as f:
        json.dump(stamp(out), f, indent=2)


if __name__ == "__main__":
    main()
