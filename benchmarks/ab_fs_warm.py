"""A/B FISTA-warm-started feature-sign (warm_start=40, the default) vs
the cold start, at the config-4 operating point (p=192, K=1024,
lam=0.15, 32768 lanes coded in 4096-lane blocks — the profile_fs.py
methodology).

Quality is judged against a 4000-iteration FISTA reference: both
variants must sit in the same suboptimality band (the lasso optimum is
path-independent; per-lane warm-vs-cold differences are symmetric fp32
convergence-band noise, NOT a warm-start bias — verified by counting
which variant is worse per lane).

Writes benchmarks/results/ab_fs_warm.json.
"""

import json
import pathlib
import time

import numpy as np

import jax.numpy as jnp

from lyssandra_tpu.solvers.lasso import feature_sign, fista


def main():
    p, K, N, lam, block = 192, 1024, 32768, 0.15, 4096
    rng = np.random.default_rng(0)
    D = rng.standard_normal((p, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    G0 = np.zeros((K, N), np.float32)
    for i in range(N):
        sup = rng.choice(K, size=8, replace=False)
        G0[sup, i] = rng.standard_normal(8)
    X = (D @ G0 + 0.05 * rng.standard_normal((p, N))).astype(np.float32)
    Dd, Xd = jnp.asarray(D), jnp.asarray(X)
    blocks = [Xd[:, i * block : (i + 1) * block]
              for i in range(N // block)]

    def run(warm):
        outs = [feature_sign(Dd, b, lam, warm_start=warm,
                             full_result=True) for b in blocks]
        G = jnp.concatenate([o.Gamma for o in outs], axis=1)
        done = jnp.concatenate([o.done for o in outs])
        return G, done

    def sync(x):
        return float(np.asarray(jnp.sum(jnp.abs(x))))

    def timed(warm, rounds=3):
        sync(run(warm)[0])
        best = float("inf")
        out = None
        for _ in range(rounds):
            t0 = time.perf_counter()
            out = run(warm)
            sync(out[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_cold, (gc, dc) = timed(0)
    t_warm, (gw, dw) = timed(40)
    gref = fista(Dd, Xd, lam, n_iter=4000)

    def obj(G):
        R = Xd - Dd @ G
        return np.asarray(jnp.sum(R * R, axis=0)
                          + lam * jnp.sum(jnp.abs(G), axis=0))

    oc, ow, orf = obj(gc), obj(gw), obj(gref)
    res = {
        "shape": {"p": p, "K": K, "N": N, "lam": lam, "block": block},
        "cold": {"seconds": round(t_cold, 3),
                 "pps": round(N / t_cold, 1),
                 "done_frac": float(np.asarray(dc).mean()),
                 "subopt_vs_fista4k_mean": float((oc - orf).mean()),
                 "subopt_vs_fista4k_max": float((oc - orf).max())},
        "warm40": {"seconds": round(t_warm, 3),
                   "pps": round(N / t_warm, 1),
                   "done_frac": float(np.asarray(dw).mean()),
                   "subopt_vs_fista4k_mean": float((ow - orf).mean()),
                   "subopt_vs_fista4k_max": float((ow - orf).max())},
        "speedup": round(t_cold / t_warm, 2),
        # symmetric fp band, not a bias: counts of which variant is worse
        "warm_worse_lanes_1e-4": int((ow > oc + 1e-4 * np.abs(oc)).sum()),
        "cold_worse_lanes_1e-4": int((oc > ow + 1e-4 * np.abs(ow)).sum()),
    }
    print(json.dumps(res))
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_warm.json"
    out.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
