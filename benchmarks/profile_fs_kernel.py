"""Roofline the fused feature-sign COLD kernel (VERDICT r4 task #6).

At config-4 the depth-28 kernel IS the coder (done_at_handoff = 1.0),
but nothing bounded the kernel itself.  Arithmetic (ops/pallas_fs.py,
counted per 256-lane block at step t, c = t+1, n_refine = 2):

  - masked_cg runs c+1 iterations at width c, each iteration issuing
    ~3c^2 single-sublane (1, Nb) row FMAs (the (c x c) Gram matvec as
    unrolled row ops) -> ~3c^3 row ops per refinement, 6c^3 per step.
  - everything else is ~50c^2 row ops (Hg/Hnew/line search) plus
    ~(6c + 12) full (K, Nb) ops (activation + KKT masks, 256 vregs
    each at K=1024/Nb=256) and two MXU matmuls.

  Sum over 28 steps: ~6*Sigma(c^3) = 989k row ops + ~0.4M row ops of
  c^2 terms + ~0.7M vreg-ops of (K, Nb) work per block.  The cubic CG
  term dominates: steps 21-28 carry 73% of ALL row ops while serving
  the <0.5% of lanes not done by depth 20 (ab_fs_fused.json
  done_at_handoff: un20 = 0.9951).

This probe times the KERNEL ALONE (fs_cold_fused, no handoff/loop) at
several depths and fits  t(T) = a*Sigma(c^3) + b*Sigma(c^2) + d*T + e
to locate the measured cost against the issue-rate model.

    python -m benchmarks.profile_fs_kernel [--depths 8,12,16,20]
        [--n 16384] [--cache DIR]

With --cache, kernels compile through the persistent compilation cache
(probe_compile_cache.json decides whether that holds on this box).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    depths = [8, 12, 16, 20]
    if "--depths" in sys.argv:
        depths = [int(v) for v in
                  sys.argv[sys.argv.index("--depths") + 1].split(",")]
    N = 16384
    if "--n" in sys.argv:
        N = int(sys.argv[sys.argv.index("--n") + 1])
    import jax

    if "--cache" in sys.argv:
        cdir = sys.argv[sys.argv.index("--cache") + 1]
        jax.config.update("jax_compilation_cache_dir", cdir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from lyssandra_tpu.ops.pallas_fs import fs_cold_fused
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    # config-4 panel: real color patches, trained-regime lam.  Calls go
    # per 2048-lane dispatch block — the EXACT executables the public
    # feature_sign route (and ab_fs_fused.json) compiles, so a warmed
    # persistent cache from the A/B regen is hit here — dispatched
    # back-to-back with one final sync (never time a single tunnel call,
    # CLAUDE.md).
    p, K, lam, block, DISPATCH = 192, 1024, 0.15, 256, 2048
    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=N, seed=1).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    rng = np.random.default_rng(0)
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Dj = jnp.asarray(D)
    blocks = [jnp.asarray(X[:, i * DISPATCH:(i + 1) * DISPATCH])
              for i in range(N // DISPATCH)]
    float(np.asarray(jnp.sum(Dj.T @ blocks[0])))  # first-fetch warm-up

    rows = {}
    for T in depths:
        def pass_once():
            outs = [fs_cold_fused(Dj, b, lam=lam, t_unroll=T,
                                  n_refine=2, block=block)
                    for b in blocks]
            float(np.asarray(sum(jnp.sum(o[4]) for o in outs)))
            return outs

        t0 = time.perf_counter()
        outs = pass_once()
        cold = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = pass_once()
            best = min(best, time.perf_counter() - t0)
        cs = np.arange(1, T + 1, dtype=np.float64)
        done = np.concatenate([np.asarray(o[5]) for o in outs])
        rows[T] = {
            "warm_seconds": round(best, 4),
            "cold_seconds": round(cold, 1),
            "pps_kernel_only": round(N / best, 1),
            "done_frac": round(float(done.mean()), 4),
            "sum_c3": float((cs ** 3).sum()),
            "sum_c2": float((cs ** 2).sum()),
        }
        print(T, rows[T], flush=True)

    res = {"shape": f"p={p} K={K} N={N} block={block} n_refine=2",
           "depths": rows}
    # least-squares fit t = a*Sc3 + b*Sc2 + d*T + e on the measured rows
    if len(rows) >= 4:
        A = np.array([[r["sum_c3"], r["sum_c2"], T, 1.0]
                      for T, r in rows.items()])
        y = np.array([r["warm_seconds"] for r in rows.values()])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        a, b, d, e = coef
        res["fit"] = {
            "seconds_per_sum_c3": a, "seconds_per_sum_c2": b,
            "seconds_per_step": d, "const": e,
            "pred_28": round(float(
                a * 164836 + b * 7714 + d * 28 + e), 3),
        }
        # per-row-op cost implied by the cubic coefficient: a is
        # seconds per unit Sigma(c^3) across ALL 64 blocks; one unit of
        # Sigma(c^3) = 6 row ops per block (n_refine=2) and the grid is
        # sequential, so cycles/row-op = a / (6 * n_blocks) * f_clock
        n_blocks = N // block
        res["fit"]["ns_per_row_op"] = round(
            a / (6.0 * n_blocks) * 1e9, 2)
    print(json.dumps(res, indent=1))
    from benchmarks import write_result

    print("wrote", write_result("profile_fs_kernel", res))


if __name__ == "__main__":
    main()
