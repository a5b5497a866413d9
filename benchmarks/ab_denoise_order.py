"""Chip A/B: raster vs energy-sorted lane order on the REAL denoise
(VERDICT r3 task #6).

The eps-exit kernel's per-block early exit measured +11% on
oracle-sorted synthetic lanes and neutral on random order (CLAUDE.md
r7).  Denoise feeds raster-ordered patches — the fused-route gate
claims raster blocks are spatially coherent, but that claim was never
A/B'd on the pipeline itself.  This harness runs the end-to-end
one-program denoise at 512^2 and 1024^2 with DenoiseConfig.order in
{raster, energy} (the sort lives INSIDE the jitted program:
apps/denoise._eps_two_phase) and asserts the outputs are identical
(lane-independent coding — pinned by
tests/test_apps.py::test_eps_two_phase_energy_order_identical).

    python -m benchmarks.ab_denoise_order
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def main():
    from lyssandra_tpu import DenoiseConfig, dct_dictionary, denoise, oracle
    from lyssandra_tpu.utils import standard_test_image

    sigma = 25.0
    D = dct_dictionary(8, 256)
    rng = np.random.default_rng(7)
    res = {"sigma": sigma, "K": 256, "images": {}}
    for size in (512, 1024):
        img = standard_test_image("barbara", size)
        noisy = (img + sigma * rng.standard_normal(img.shape)).astype(
            np.float32
        )
        rec = {"n_patches": (size - 7) ** 2}
        outs = {}
        for order in ("raster", "energy"):
            cfg = DenoiseConfig(sigma=sigma, T_max=16, block=16384,
                                order=order)
            den = denoise(noisy, D, sigma, cfg=cfg)   # compile + warm
            _sync(den)
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                den = denoise(noisy, D, sigma, cfg=cfg)
                _sync(den)
                best = min(best, time.perf_counter() - t0)
            outs[order] = np.asarray(den)
            rec[order] = {
                "seconds_warm": round(best, 4),
                "patches_per_sec": round(rec["n_patches"] / best, 1),
                "psnr": round(
                    oracle.psnr(np.asarray(den, np.float64),
                                img.astype(np.float64)), 3,
                ),
            }
            print(json.dumps({f"{size}.{order}": rec[order]}), flush=True)
        rec["max_abs_diff"] = float(
            np.abs(outs["raster"] - outs["energy"]).max()
        )
        rec["energy_speedup"] = round(
            rec["raster"]["seconds_warm"] / rec["energy"]["seconds_warm"],
            4,
        )
        res["images"][f"barbara_{size}"] = rec
        print(json.dumps({f"{size}.summary": {
            "max_abs_diff": rec["max_abs_diff"],
            "energy_speedup": rec["energy_speedup"]}}), flush=True)

    from benchmarks import write_result

    print("wrote", write_result("ab_denoise_order", res))


if __name__ == "__main__":
    main()
