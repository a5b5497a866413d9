"""Model-sharded (atom-axis) OMP scaling curve on the virtual CPU mesh
(VERDICT r2 task #4 / weak #6: the huge-K stretch row was
correctness-only — no throughput evidence that psum-per-step selection
is viable).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m benchmarks.model_sharded_scale

No multi-chip hardware exists here (CLAUDE.md), so this measures the
*communication/overhead shape*, not absolute TPU rates: K=4096 OMP wall
time on a (1, m) data x model CPU mesh for m in {1, 2, 4, 8}, against
the single-device replicated solver on the same backend and data.
What the curve answers: does per-step pmax/pmin/psum selection overhead
grow with m (bad: latency-dominated) or amortize (viable for ICI where
per-hop latency is ~us)?  Per-patch outputs are asserted equal to the
replicated solver, so the timing compares identical work.

Writes benchmarks/results/model_sharded_scale.json.
"""

from __future__ import annotations

import json
import time

import numpy as np

P_DIM, K, T, N = 64, 4096, 8, 4096


def _best(fn, reps=3):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lyssandra_tpu.parallel.model_sharded import omp_model_sharded
    from lyssandra_tpu.solvers.greedy import _omp_impl
    from lyssandra_tpu.solvers import greedy

    devs = np.array(jax.devices("cpu"))
    assert len(devs) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    rng = np.random.default_rng(0)
    D = rng.standard_normal((P_DIM, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((P_DIM, N)).astype(np.float32)
    X /= np.linalg.norm(X, axis=0, keepdims=True)
    Dj, Xj = jnp.asarray(D), jnp.asarray(X)

    res = {"shape": {"p": P_DIM, "K": K, "T": T, "N": N,
                     "backend": "cpu-mesh (overhead shape, not TPU rates)"}}

    # replicated single-device baseline (the XLA-scan solver: the fused
    # Pallas kernel is TPU-only)
    ref = _omp_impl(Dj, Xj, 0.0, T=T, eps_mode=False,
                    precision=greedy._HI)
    t_rep = _best(lambda: float(np.asarray(jnp.sum(_omp_impl(
        Dj, Xj, 0.0, T=T, eps_mode=False,
        precision=greedy._HI).gamma))))
    res["replicated_1dev_s"] = round(t_rep, 3)
    print(json.dumps({"replicated_1dev_s": res["replicated_1dev_s"]}),
          flush=True)

    for m in (1, 2, 4, 8):
        mesh = Mesh(devs[:m].reshape(1, m), ("data", "model"))
        out = omp_model_sharded(Dj, Xj, T, mesh=mesh, dense=False)
        # identical work check (per-patch equality vs replicated)
        np.testing.assert_array_equal(np.asarray(out.idx),
                                      np.asarray(ref.idx))
        t = _best(lambda: float(np.asarray(jnp.sum(omp_model_sharded(
            Dj, Xj, T, mesh=mesh, dense=False).gamma))))
        res[f"model_sharded_m{m}_s"] = round(t, 3)
        res[f"model_sharded_m{m}_vs_replicated"] = round(t_rep / t, 3)
        print(json.dumps({f"m{m}": res[f"model_sharded_m{m}_s"],
                          "vs_rep": res[f"model_sharded_m{m}_vs_replicated"]}),
              flush=True)

    print(json.dumps(res))
    from benchmarks import write_result

    print("wrote", write_result("model_sharded_scale", res))


if __name__ == "__main__":
    main()
