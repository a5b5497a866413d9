"""Chip A/B: T-mode fused-OMP lane block vs raised Mosaic VMEM budget.

    python -m benchmarks.ab_block_vmem

At K=1024 the fused kernel runs block=512 under the 16 MB scoped-VMEM
compiler default (the (K, block) f32 live set caps it — greedy.py
ladder).  r9 established the default is raisable
(`pltpu.CompilerParams(vmem_limit_bytes=...)`, v5e VMEM = 128 MB);
this A/B asks whether a wider lane block under a raised budget beats
the b512 default at the north-star shape (p=64, K=1024, T=8).

Timing per bench.py discipline: warm every variant, one big single
dispatch (N=262144 lanes), scalar-checksum sync, best of 3.  Outputs
(idx) asserted bitwise-equal across variants.
"""

from __future__ import annotations

import json
import time

import numpy as np

P, K, T, N = 64, 1024, 8, 262144


def main():
    import jax.numpy as jnp

    from lyssandra_tpu.ops.pallas_omp import omp_fused

    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((P, N))
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    Dj = jnp.asarray(D, jnp.float32)
    Xj = jnp.asarray(X, jnp.float32)

    variants = [
        ("b512_default", dict(block=512, vmem_limit_mb=None)),
        ("b512_v40", dict(block=512, vmem_limit_mb=40)),
        ("b1024_v40", dict(block=1024, vmem_limit_mb=40)),
        ("b1024_v64", dict(block=1024, vmem_limit_mb=64)),
        ("b2048_v64", dict(block=2048, vmem_limit_mb=64)),
        ("b2048_v96", dict(block=2048, vmem_limit_mb=96)),
    ]

    out, idx_ref = {}, None
    for name, kw in variants:
        try:
            idx, gamma, err, nsel = omp_fused(
                Dj, Xj, T=T, dk_mode="split3", **kw)
            # warm + parity check in one fetch
            idx_np = np.asarray(idx)
            float(np.asarray(jnp.sum(err)))
            if idx_ref is None:
                idx_ref = idx_np
            parity = bool(np.array_equal(idx_ref, idx_np))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                _, _, err, _ = omp_fused(Dj, Xj, T=T, dk_mode="split3", **kw)
                float(np.asarray(jnp.sum(err)))
                best = min(best, time.perf_counter() - t0)
            out[name] = {
                "patches_per_sec": round(N / best, 1),
                "seconds": round(best, 4),
                "idx_bitwise_equal_b512": parity,
            }
        except Exception as e:  # noqa: BLE001 — record OOM/compile fails
            out[name] = {"error": str(e)[:300]}
        print(json.dumps({name: out[name]}), flush=True)

    from benchmarks import write_result

    res = {"shape": f"p={P} K={K} T={T} N={N} single dispatch",
           "variants": out}
    print("wrote", write_result("ab_block_vmem", res))


if __name__ == "__main__":
    main()
