"""A/B the single-program denoise fast path (apps.denoise
_denoise_fused_impl: fused patches -> device-resident two-phase eps coder
-> blend, ONE dispatch) against the r3 eager route (per-stage dispatches
+ a host fetch of the convergence mask), at the config-3 shape
(512^2, p=8, K=256, sigma=25, T_max=16).

Both variants run in THIS process back to back (same warmup, same machine
state), timed best-of-R around `reps` dispatches with one final checksum
sync.  Writes benchmarks/results/ab_denoise_fused.json.
"""

import json
import math
import pathlib
import time

import numpy as np

import jax.numpy as jnp

from lyssandra_tpu.apps.denoise import Denoiser, psnr
from lyssandra_tpu.config import DenoiseConfig
from lyssandra_tpu.ops.dictionaries import dct_dictionary
from lyssandra_tpu.ops.pallas_patches import fused_patch_pipeline
from lyssandra_tpu.ops.patches import weighted_reconstruct
from lyssandra_tpu.utils.datasets import synthetic_image


def _sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def time_variant(fn, reps=5, rounds=3):
    _sync(fn())
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
    p, K, sigma, T_max = 8, 256, 25.0, 16
    img = synthetic_image("texture", 512, seed=0)
    rng = np.random.default_rng(1)
    noisy = jnp.asarray(
        img + sigma * rng.standard_normal(img.shape), jnp.float32
    )
    D = jnp.asarray(dct_dictionary(p, K), jnp.float32)
    cfg = DenoiseConfig(patch=p, sigma=sigma, T_max=T_max)
    den = Denoiser(D, cfg)
    eps = cfg.gain * math.sqrt(p * p) * sigma
    lam_w = cfg.lam / sigma
    T1 = min(10, T_max)

    def old_eager():
        # the r3 route: per-stage dispatches + host mask fetch
        from lyssandra_tpu.solvers.greedy import _omp_fused_call

        Xc, means, _ = fused_patch_pipeline(noisy, p, do_dc=True)
        res = _omp_fused_call(D, Xc, T=T1, eps=float(eps), eps_mode=True,
                              dense=False)
        bad = np.asarray((res.nsel == T1) & (res.err > eps * eps))
        assert int(bad.sum()) == 0
        Gamma = res.dense(K)
        Xhat = D @ Gamma + means[None, :]
        return weighted_reconstruct(Xhat, noisy, p, lam_w)

    def new_fused():
        return den(noisy)

    t_old = time_variant(old_eager)
    t_new = time_variant(new_fused)
    p_old = psnr(old_eager(), img)
    p_new = psnr(new_fused(), img)

    res = {
        "shape": {"img": 512, "p": p, "K": K, "sigma": sigma,
                  "T_max": T_max},
        "old_eager_s": round(t_old, 4),
        "new_one_program_s": round(t_new, 4),
        "speedup": round(t_old / t_new, 2),
        "psnr_old": round(p_old, 4),
        "psnr_new": round(p_new, 4),
    }
    print(json.dumps(res))
    out = pathlib.Path(__file__).parent / "results" / "ab_denoise_fused.json"
    out.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
