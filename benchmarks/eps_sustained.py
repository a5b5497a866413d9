"""Honest sustained eps-mode OMP throughput (VERDICT r2 task #2).

    python -m benchmarks.eps_sustained

The r7 eps probe timed a single 32k-lane dispatch at 31.25 ms — within
noise of the ~31 ms tunnel round trip (CLAUDE.md: NEVER time a single
call).  This reproduces bench.py's sustained methodology for the eps
route: single dispatches at N=262k and N=1M (device-side concat of
permuted copies, so lane blocks differ), best-of-5 warm, scalar-
checksum sync.

Also decomposes the "per-executed-step cost" question by timing, at the
SAME (p=64, K=1024, T=16, N=1M) shape:
  - t_mode      : fused value kernel, eps_mode=False (every lane does
                  exactly T steps — the per-step reference);
  - eps_value   : fused value kernel, eps_mode=True, no early exit
                  (same T steps/lane + the eps bookkeeping: delta
                  recurrence, done predicates, frozen-lane selects);
  - eps_exit    : the production per-block pl.when early-exit kernel
                  (a block executes ~max-nsel-in-block steps).
per_step_ns = wall / (lanes * steps_executed); for eps_exit the
executed-step count is estimated from per-block max nsel (fetched once,
untimed).  Writes benchmarks/results/eps_sustained.json.
"""

from __future__ import annotations

import json
import time

import numpy as np

P, K, T = 64, 1024, 16
N0 = 262144
EPS = 0.1


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _best(fn, reps=5):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def make_data(n):
    """Denoise-like mid-difficulty lanes: 3-sparse + noise, mean nsel~5
    at EPS (the ab_eps_fused operating point)."""
    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0)
    idx = rng.integers(0, K, (n, 3))
    coef = rng.standard_normal((n, 3))
    X = np.zeros((P, n), np.float32)
    for j in range(3):
        X += (D[:, idx[:, j]] * coef[:, j]).astype(np.float32)
    X += 0.02 * rng.standard_normal((P, n)).astype(np.float32)
    X /= np.linalg.norm(X, axis=0)
    return D.astype(np.float32), X


def main():
    import jax
    import jax.numpy as jnp

    from lyssandra_tpu import solvers
    from lyssandra_tpu.ops.pallas_omp import omp_fused

    D, X = make_data(N0)
    Dj = jnp.asarray(D)
    Xj = jnp.asarray(X)

    res = {"shape": {"p": P, "K": K, "N0": N0, "T": T, "eps": EPS}}

    # nsel stats (untimed): drives the executed-step estimate
    out = omp_fused(Dj, Xj, T=T, eps=EPS, eps_mode=True, block=512,
                    dk_mode="split3")
    nsel = np.asarray(out[3])
    blkmax = nsel.reshape(-1, 512).max(axis=1)
    res["mean_nsel"] = round(float(nsel.mean()), 3)
    res["mean_block_max_nsel"] = round(float(blkmax.mean()), 3)

    # 1M-lane device-side concat of 4 permuted copies (bench.py pattern)
    key = jax.random.PRNGKey(0)
    perms = [jax.random.permutation(k, N0) for k in jax.random.split(key, 3)]
    Xbig = jnp.concatenate([Xj] + [Xj[:, pm] for pm in perms], axis=1)
    NB = int(Xbig.shape[1])

    def route(Xin):
        return solvers.batch_omp(Dj, Xin, T, eps=EPS, dense=False).err

    def kern(Xin, eps_mode, eps_exit):
        return omp_fused(Dj, Xin, T=T, eps=EPS, eps_mode=eps_mode,
                         block=512, dk_mode="split3", eps_exit=eps_exit)[1]

    # headline: the public eps route, 262k and 1M single dispatches
    t262 = _best(lambda: _sync(route(Xj)))
    t1m = _best(lambda: _sync(route(Xbig)))
    res["public_route_262k_pps"] = round(N0 / t262, 1)
    res["public_route_1m_pps"] = round(NB / t1m, 1)

    # per-step decomposition at N=1M
    t_tmode = _best(lambda: _sync(kern(Xbig, False, False)))
    t_eval = _best(lambda: _sync(kern(Xbig, True, False)))
    t_exit = _best(lambda: _sync(kern(Xbig, True, True)))
    steps_exit = float(blkmax.mean())      # per-block executed steps
    res["kernel_1m"] = {
        "t_mode_ms": round(t_tmode * 1e3, 2),
        "eps_value_ms": round(t_eval * 1e3, 2),
        "eps_exit_ms": round(t_exit * 1e3, 2),
        "t_mode_per_step_ns": round(t_tmode / (NB * T) * 1e9, 2),
        "eps_value_per_step_ns": round(t_eval / (NB * T) * 1e9, 2),
        "eps_exit_per_executed_step_ns": round(
            t_exit / (NB * steps_exit) * 1e9, 2),
        "eps_exit_pps": round(NB / t_exit, 1),
    }
    print(json.dumps(res, indent=2))
    from benchmarks import write_result

    print("wrote", write_result("eps_sustained", res))


if __name__ == "__main__":
    main()
