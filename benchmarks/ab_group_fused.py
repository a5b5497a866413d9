"""A/B the fused Pallas group-OMP kernel vs the XLA scan, through the
PUBLIC route (solvers.greedy.group_omp), at the group-OMP scale probe
shape (K=1024, gs=4, T=4, N=32k).

Timing discipline per CLAUDE.md: warm both variants, then best-of-R
wall-clock around `reps` back-to-back dispatches with ONE final
checksum fetch (the axon tunnel round trip is ~31 ms; block_until_ready
returns early on this backend).

Writes benchmarks/results/group_omp_fused.json.
"""

import json
import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp

from lyssandra_tpu.solvers.greedy import group_omp


def _sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def time_variant(fn, reps=5, rounds=3):
    _sync(fn())                      # warm (compile + first-fetch stall)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    p, K, N, gs, T = 64, 1024, 32768, 4, 4
    rng = np.random.default_rng(0)
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((p, N)).astype(np.float32)
    groups = np.repeat(np.arange(K // gs), gs)
    Dd = jnp.asarray(D)              # device arrays, like the public path
    Xd = jnp.asarray(X)

    t_xla = time_variant(
        lambda: group_omp(Dd, Xd, groups, T, fused=False, dense=False).gamma
    )
    t_fused = time_variant(
        lambda: group_omp(Dd, Xd, groups, T, fused=True, dense=False).gamma
    )
    # sublane-packed factor variant (VERDICT r2 task #8): the plain
    # kernel is VPU-issue bound at 1/8 sublane utilization on its row
    # ops; packing may also move the block optimum, so probe 512 too.
    from lyssandra_tpu.ops.pallas_group import group_omp_fused as gof

    t_packed = time_variant(
        lambda: gof(Dd, Xd, groups, T, block=256, packed=True)[1]
    )
    t_packed512 = time_variant(
        lambda: gof(Dd, Xd, groups, T, block=512, packed=True)[1]
    )

    ref = np.asarray(group_omp(Dd, Xd, groups, T, fused=False))
    out = np.asarray(group_omp(Dd, Xd, groups, T, fused=True))
    outp = np.asarray(
        group_omp(Dd, Xd, groups, T, fused=True, packed=True)
    )
    scale = max(np.abs(ref).max(), 1e-30)
    parity = float(np.abs(out - ref).max() / scale)
    parity_packed = float(np.abs(outp - ref).max() / scale)

    res = {
        "shape": {"p": p, "K": K, "N": N, "gs": gs, "T": T},
        "xla": {"seconds": round(t_xla, 4), "pps": round(N / t_xla, 1)},
        "fused_b256": {
            "seconds": round(t_fused, 4), "pps": round(N / t_fused, 1),
        },
        "packed_b256": {
            "seconds": round(t_packed, 4), "pps": round(N / t_packed, 1),
        },
        "packed_b512": {
            "seconds": round(t_packed512, 4),
            "pps": round(N / t_packed512, 1),
        },
        "parity_rel": parity,
        "parity_rel_packed": parity_packed,
        "speedup": round(t_xla / t_fused, 2),
        "speedup_packed": round(t_xla / t_packed, 2),
    }
    print(json.dumps(res))
    from benchmarks import write_result

    write_result("group_omp_fused", res)


if __name__ == "__main__":
    main()
