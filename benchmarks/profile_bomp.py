"""Profile the north-star Batch-OMP kernel on the real chip (VERDICT r1 #2).

Two latency regimes matter on this machine: a host->device dispatch+fetch
round trip over the axon tunnel costs ~35 ms, while the whole 8-step
solver runs ~12 ms of device time — so every micro-op is timed with
IN-PROGRAM repetition (a lax.scan of `LOOP` dependent iterations per
dispatch), and end-to-end throughput with back-to-back async dispatches
synced once (the bench.py discipline).

Outputs benchmarks/results/profile_bomp.json and a Perfetto trace dir
benchmarks/results/profile_bomp_trace/.

Usage: python -m benchmarks.profile_bomp
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from lyssandra_tpu.solvers import greedy
from lyssandra_tpu.utils.profiling import profile_trace

N, P, K, T = 32768, 64, 1024, 8
LOOP = 64            # in-program repetitions per micro-op dispatch
_HI = lax.Precision.HIGHEST
RESULTS = os.path.join(os.path.dirname(__file__), "results")


def _fetch(x) -> float:
    return float(np.asarray(jnp.sum(x)))


def loop_time(fn, *args, reps: int = 3) -> float:
    """Seconds per iteration of `fn`, amortized over LOOP in-program
    iterations x `reps` dispatches.  fn(carry_scalar, *args) -> scalar;
    the scalar carry forces iteration-to-iteration dependency so XLA
    cannot hoist the body out of the scan."""

    @jax.jit
    def run(*a):
        def body(c, _):
            return fn(c, *a), None
        c, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=LOOP)
        return c

    _fetch(run(*args))                      # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / LOOP


def main():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    X = rng.standard_normal((P, N)).astype(np.float32)
    Dj, Xj = jnp.asarray(D), jnp.asarray(X)
    r = Xj.T
    corr0 = jnp.matmul(r, Dj, precision=_HI)
    Linv = jnp.zeros((N, T, T), jnp.float32)
    Dsel = rng.standard_normal((N, T, P)).astype(np.float32)
    a0sel = rng.standard_normal((N, T)).astype(np.float32)

    out = {"shape": {"N": N, "p": P, "K": K, "T": T}, "loop": LOOP}

    # tunnel round-trip floor (trivial op, one dispatch+fetch)
    tiny = jnp.ones((8,), jnp.float32)
    _fetch(tiny * 2)
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch(tiny * 2)
    out["dispatch_fetch_roundtrip_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    dt = loop_time(
        lambda c, r, D: jnp.max(jnp.abs(
            jnp.matmul(r + c * 1e-30, D, precision=_HI))),
        r, Dj,
    )
    out["corr_matmul_f32_ms"] = dt * 1e3
    out["corr_matmul_f32_tflops"] = 2 * N * P * K / dt / 1e12

    dt = loop_time(
        lambda c, r, D: jnp.max(jnp.abs(jnp.matmul(
            (r + c * 1e-30).astype(jnp.bfloat16), D.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32))),
        r, Dj,
    )
    out["corr_matmul_bf16_ms"] = dt * 1e3

    dt = loop_time(
        lambda c, corr: greedy._argmax_abs(
            corr + c * 1e-30).astype(jnp.float32).sum() * 1e-30,
        corr0,
    )
    out["argmax_pair_ms"] = dt * 1e3
    out["argmax_pair_gbps"] = 2 * N * K * 4 / dt / 1e9

    def chol_body(c, Linv, Dsel, a0sel, r):
        dk = jnp.take(Dj.T, jnp.zeros((N,), jnp.int32) + (c * 0).astype(
            jnp.int32), axis=0)
        g = jnp.einsum("ntp,np->nt", Dsel, dk, precision=_HI)
        L2, nu = greedy._append_cholesky_inv(Linv + c * 1e-30, g, T - 1)
        gam = greedy._solve_gamma(L2, a0sel)
        return jnp.sum(gam) * 1e-30 + jnp.sum(nu) * 1e-30

    out["gather_chol_solve_ms"] = loop_time(
        chol_body, Linv, Dsel, a0sel, r) * 1e3

    # end-to-end: back-to-back async dispatches, one sync (bench discipline)
    def solver_pps(**kw):
        outs = greedy.batch_omp(Dj, Xj, T, dense=False, **kw)
        _fetch(outs.err)                    # warm path
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            chks = [
                greedy.batch_omp(Dj, Xj, T, dense=False, **kw).err
                for _ in range(8)
            ]
            _fetch(jnp.sum(jnp.stack(chks)))
            best = min(best, time.perf_counter() - t0)
        return 8 * N / best, best / 8 * 1e3

    out["full_f32_patches_per_sec"], out["full_f32_ms_per_block"] = \
        solver_pps()
    (out["full_bf16sel_patches_per_sec"],
     out["full_bf16sel_ms_per_block"]) = solver_pps(corr_dtype="bf16")

    step_ms = out["full_f32_ms_per_block"] / T
    out["per_step_ms"] = step_ms
    out["per_step_accounted_ms"] = (
        out["corr_matmul_f32_ms"] + out["argmax_pair_ms"]
        + out["gather_chol_solve_ms"]
    )
    out["effective_tflops_f32"] = (
        T * 2 * N * P * K / (out["full_f32_ms_per_block"] / 1e3) / 1e12
    )

    # Perfetto trace of one full solve
    tracedir = os.path.join(RESULTS, "profile_bomp_trace")
    with profile_trace(tracedir):
        res = greedy.batch_omp(Dj, Xj, T, dense=False)
        _fetch(res.err)

    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "profile_bomp.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
