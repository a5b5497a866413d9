"""eps-mode fused-kernel A/B on chip (r7).

    python -m benchmarks.ab_eps_fused

Three questions, answered on the chip:
  1. fused vs XLA scan for eps-stopped OMP (the r2-r6 gate kept eps on
     the scan because the always-T fused kernel lost at denoise shapes);
  2. does the per-block early exit of the new ref-state kernel
     (ops/pallas_omp._kernel_eps_exit) pay over the value kernel, on
     randomly-ordered vs difficulty-sorted lanes;
  3. the public batch_omp(eps=) route throughput at the sweep shape.

Writes benchmarks/results/ab_eps_fused.json.
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _best(fn, reps=5):
    fn()  # warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax.numpy as jnp

    from lyssandra_tpu import solvers
    from lyssandra_tpu.ops.pallas_omp import omp_fused
    from lyssandra_tpu.solvers.greedy import _HI, _omp_impl

    rng = np.random.default_rng(0)
    p, K, N, T = 64, 1024, 32768, 16
    D = rng.standard_normal((p, K))
    D /= np.linalg.norm(D, axis=0)
    Dj = jnp.asarray(D, jnp.float32)

    # mid-difficulty synthetic: 3-sparse + noise, mean nsel ~ 5
    idx = rng.integers(0, K, (N, 3))
    coef = rng.standard_normal((N, 3))
    X = np.zeros((p, N), np.float32)
    for j in range(3):
        X += (D[:, idx[:, j]] * coef[:, j]).astype(np.float32)
    X += 0.02 * rng.standard_normal((p, N)).astype(np.float32)
    X /= np.linalg.norm(X, axis=0)
    Xj = jnp.asarray(X, jnp.float32)
    eps = 0.1

    res = {"shape": {"p": p, "K": K, "N": N, "T": T, "eps": eps}}

    t_scan = _best(lambda: _sync(_omp_impl(
        Dj, Xj, eps, T=T, eps_mode=True, precision=_HI).gamma))
    t_val = _best(lambda: _sync(omp_fused(
        Dj, Xj, T=T, eps=eps, eps_mode=True, block=512,
        dk_mode="split3", eps_exit=False)[1]))
    t_exit = _best(lambda: _sync(omp_fused(
        Dj, Xj, T=T, eps=eps, eps_mode=True, block=512,
        dk_mode="split3", eps_exit=True)[1]))
    out = omp_fused(Dj, Xj, T=T, eps=eps, eps_mode=True, block=512,
                    dk_mode="split3")
    res["mean_nsel"] = float(jnp.mean(out[3]))
    res["probe_random_order_ms"] = {
        "xla_scan": round(t_scan * 1e3, 2),
        "fused_value": round(t_val * 1e3, 2),
        "fused_exit": round(t_exit * 1e3, 2),
        "fused_vs_scan": round(t_scan / t_exit, 2),
    }

    # oracle-sorted lanes: upper bound of what difficulty sorting buys
    # the per-block exit (blocks become trip-count homogeneous)
    order = np.argsort(np.asarray(out[3]))
    Xs = Xj[:, jnp.asarray(order)]
    t_val_s = _best(lambda: _sync(omp_fused(
        Dj, Xs, T=T, eps=eps, eps_mode=True, block=512,
        dk_mode="split3", eps_exit=False)[1]))
    t_exit_s = _best(lambda: _sync(omp_fused(
        Dj, Xs, T=T, eps=eps, eps_mode=True, block=512,
        dk_mode="split3", eps_exit=True)[1]))
    res["probe_sorted_ms"] = {
        "fused_value": round(t_val_s * 1e3, 2),
        "fused_exit": round(t_exit_s * 1e3, 2),
        "exit_gain_sorted": round(t_val_s / t_exit_s, 2),
    }

    # public route at the sweep's omp_eps operating point (every lane
    # rides to T on this data: pure fused-vs-scan, no exit contribution)
    Xr = rng.standard_normal((p, N))
    Xr /= np.linalg.norm(Xr, axis=0)
    Xr = jnp.asarray(Xr, jnp.float32)
    t_route = _best(lambda: _sync(
        solvers.batch_omp(Dj, Xr, T, eps=0.05, dense=False).err), reps=3)
    res["public_omp_eps_route_pps"] = round(N / t_route, 1)

    path = pathlib.Path(__file__).parent / "results" / "ab_eps_fused.json"
    path.write_text(json.dumps(res, indent=2))
    print(json.dumps(res, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    main()
