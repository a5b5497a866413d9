"""Feature-sign design-matrix A/B on chip: active-set capacity
{wide A=64, narrow auto_capacity=16} x FISTA warm start {0, 40} x
dictionary regime {incoherent, coherent}, all within ONE process (the
tunneled backend swings ~20% between sessions — only within-process
ratios are trustworthy).

Supersedes ab_fs_warm.py (r4): that A/B measured the warm start against
the pre-r5 inner step, whose discrete line search cost ~65 active-Gram
matvecs per refinement.  The r5 inner step caches the Gram matvec Hg and
maintains it by affine updates, collapsing the line search to two dot
products — which changes the design trade-offs, so the whole matrix is
re-measured here.  Decision record (v5e chip, 2026-08-17, this script):

  - wide-cold is the best config in BOTH regimes -> defaults
    warm_start=0, auto_capacity=False;
  - warm start loses everywhere (0.88x wide, 0.91x narrow) — FISTA-40
    itself is only ~0.03 s/4096-lane block; the loss is seeded lanes
    refining a junk-laden active set vs cheap cold growth;
  - narrow capacity loses 0.92-0.95x on chip (the (N, 64, 64) einsums
    are latency-bound, not flop-bound, so shrinking them saves nothing
    and the overflow check adds a host sync) but wins ~5x on CPU
    backends where the O(A^2) matvec work is real — kept as opt-in.

Quality: every variant's mean objective must agree to ~1e-6 relative
(the lasso optimum is unique; paths differ, optima don't), and the
incoherent wide-cold result is additionally checked against a
4000-iteration FISTA reference.  Writes
benchmarks/results/ab_fs_design.json.
"""

import json
import pathlib
import time

import numpy as np
import jax.numpy as jnp

from lyssandra_tpu.solvers.lasso import feature_sign, fista

P, K, N, LAM, BLOCK = 192, 1024, 8192, 0.15, 4096


def make_problem(kind):
    rng = np.random.default_rng(1)
    if kind == "coherent":
        # partially-trained online-DL regime: 64 base directions, each
        # repeated 16x with noise (the config-4 r4 regression regime)
        base = rng.standard_normal((P, 64))
        D = np.repeat(base, K // 64, axis=1)
        D += 0.15 * rng.standard_normal((P, K))
    else:
        D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    D = D.astype(np.float32)
    G0 = np.zeros((K, N), np.float32)
    for i in range(N):
        sup = rng.choice(K, size=8, replace=False)
        G0[sup, i] = rng.standard_normal(8)
    X = (D @ G0 + 0.05 * rng.standard_normal((P, N))).astype(np.float32)
    return jnp.asarray(D), jnp.asarray(X)


def sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def main():
    res = {"shape": {"p": P, "K": K, "N": N, "lam": LAM, "block": BLOCK}}
    for kind in ("incoherent", "coherent"):
        Dd, Xd = make_problem(kind)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        def run(auto, warm):
            outs = [feature_sign(Dd, b, LAM, warm_start=warm,
                                 auto_capacity=auto, full_result=True)
                    for b in blocks]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj(G):
            R = Xd - Dd @ G
            return np.asarray(jnp.sum(R * R, axis=0)
                              + LAM * jnp.sum(jnp.abs(G), axis=0))

        sect = {}
        for auto in (False, True):
            for warm in (0, 40):
                sync(run(auto, warm)[0])            # warmup/compile
                best, g, d = np.inf, None, None
                for _ in range(3):
                    t0 = time.perf_counter()
                    g, d = run(auto, warm)
                    sync(g)
                    best = min(best, time.perf_counter() - t0)
                tag = f"{'narrow16' if auto else 'wide64'}_warm{warm}"
                sect[tag] = {
                    "seconds": round(best, 3),
                    "pps": round(N / best, 1),
                    "done_frac": float(np.asarray(d).mean()),
                    "obj_mean": float(obj(g).mean()),
                }
                print(json.dumps({f"{kind}.{tag}": sect[tag]}), flush=True)
        if kind == "incoherent":
            gref = fista(Dd, Xd, LAM, n_iter=4000)
            ow = obj(run(False, 0)[0])
            orf = obj(gref)
            sect["wide64_warm0_subopt_vs_fista4k"] = {
                "mean": float((ow - orf).mean()),
                "max": float((ow - orf).max()),
            }
        res[kind] = sect
    print(json.dumps(res))
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_design.json"
    out.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
