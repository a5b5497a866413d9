"""Denoise wall-clock at image scale (r9 scale-envelope complement).

config-3 measures 512^2 (255k patches, ~0.15-0.26 s warm).  This probe
runs the same one-device-program eps pipeline at 1024^2 (~1.04M
overlapping patches) and 768^2, answering whether the two-phase fused
eps solve + overlap-add stays HBM-resident and throughput-flat as the
patch count grows 4x past the tuned point.

    python -m benchmarks.denoise_scale
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
    cfg = DenoiseConfig(sigma=sigma, T_max=16, block=16384)
    rng = np.random.default_rng(7)
    res = {"sigma": sigma, "K": 256, "images": {}}
    for size in (512, 768, 1024):
        img = standard_test_image("barbara", size)
        noisy = (img + sigma * rng.standard_normal(img.shape)).astype(
            np.float32
        )
        den = denoise(noisy, D, sigma, cfg=cfg)       # compile + warm
        _sync(den)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            den = denoise(noisy, D, sigma, cfg=cfg)
            _sync(den)
            best = min(best, time.perf_counter() - t0)
        n_patches = (size - 7) ** 2
        res["images"][f"barbara_{size}"] = {
            "n_patches": n_patches,
            "seconds_warm": round(best, 4),
            "patches_per_sec": round(n_patches / best, 1),
            "psnr": round(
                oracle.psnr(np.asarray(den, np.float64),
                            img.astype(np.float64)), 3,
            ),
            "psnr_noisy": round(
                oracle.psnr(noisy.astype(np.float64),
                            img.astype(np.float64)), 3,
            ),
        }
        print(json.dumps({f"barbara_{size}":
                          res["images"][f"barbara_{size}"]}), flush=True)

    from benchmarks import write_result

    print("wrote", write_result("denoise_scale", res))


if __name__ == "__main__":
    main()
