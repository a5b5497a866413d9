"""On-chip A/B of fused-OMP kernel variants at the north-star shape.

    python -m benchmarks.ab_fused

Variants: lane block size x dk fetch mode ('hi' = HIGHEST one-hot matmul,
6 MXU passes; 'split3' = exact 3-way bf16 split, 3 passes, bitwise-equal
idx/gamma — tests/test_pallas_omp.py).  Timing per bench.py discipline:
warm every buffer, dispatch blocks back-to-back, sync once via a scalar
checksum (axon tunnel: block_until_ready returns early, ~31 ms/round trip).
Each variant's idx/gamma are also compared against the default for
bitwise parity ON CHIP before it can be promoted.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

P, K, T = 64, 1024, 8
N = 32768
STEPS = 8

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def main():
    import jax.numpy as jnp

    from lyssandra_tpu.ops.pallas_omp import omp_fused

    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Dj = jnp.asarray(D, jnp.float32)
    blocks = [
        jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
        for _ in range(STEPS)
    ]

    variants = [
        ("b256_hi", dict(block=256, dk_mode="hi")),
        ("b512_hi", dict(block=512, dk_mode="hi")),
        ("b1024_hi", dict(block=1024, dk_mode="hi")),
        ("b256_split3", dict(block=256, dk_mode="split3")),
        ("b512_split3", dict(block=512, dk_mode="split3")),
    ]

    out = {}
    ref0 = None
    ref_name = None
    for name, kw in variants:
        def run(Xb):
            idx, gam, err, nsel = omp_fused(Dj, Xb, T=T, **kw)
            return (idx, gam), jnp.sum(err)

        try:
            for Xb in blocks:
                _, chk = run(Xb)
                float(np.asarray(chk))
        except Exception as e:  # noqa: BLE001 — record and move on
            out[name] = {"error": str(e)[:200]}
            print(name, "FAILED", str(e)[:120])
            continue

        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            chks = [run(Xb)[1] for Xb in blocks]
            float(np.asarray(jnp.sum(jnp.stack(chks))))
            best = min(best, time.perf_counter() - t0)
        pps = STEPS * N / best

        (idx, gam), _ = run(blocks[0])
        idx, gam = np.asarray(idx), np.asarray(gam)
        if ref0 is None:
            ref0 = (idx, gam)
            ref_name = name
            parity = "reference"
        else:
            parity = bool(
                (idx == ref0[0]).all() and (gam == ref0[1]).all()
            )
        # the reference is the first variant that RAN (not a fixed name:
        # if b256_hi fails its compile check, the label must follow)
        out[name] = {"patches_per_sec": round(pps, 1),
                     "bitwise_vs": ref_name, "bitwise_equal": parity}
        print(name, out[name])

    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "ab_fused.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
