"""North-star benchmark: Batch-OMP throughput, K=1024, T=8 (BASELINE.json).

Measures
  - the CPU reference baseline: the in-tree NumPy oracle (the reference
    publishes no numbers — BASELINE.md — so the baseline is the oracle
    measured on this machine's CPU), and
  - the TPU implementation: batched Batch-OMP lax.scan on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": tpu_patches_per_sec, "unit": "patches/s",
   "vs_baseline": tpu/cpu_ratio}
Details (including denoising PSNR parity when cheap) go to
benchmarks/results/.
"""

import json
import os
import time

import numpy as np

P, K, T = 64, 1024, 8
CPU_N = 512          # oracle patches for the baseline measurement
TPU_BLOCK = 32768    # lanes per device step
TPU_STEPS = 8        # timed steps (blocks)


def measure_cpu_oracle(D, X):
    from lyssandra_tpu import oracle

    t0 = time.perf_counter()
    oracle.batch_omp(D[:, :], X[:, :CPU_N], T)
    dt = time.perf_counter() - t0
    return CPU_N / dt


def measure_tpu(D, Xblocks):
    import jax
    import jax.numpy as jnp

    from lyssandra_tpu.solvers import greedy

    Dj = jnp.asarray(D, jnp.float32)
    blocks = [jnp.asarray(Xb, jnp.float32) for Xb in Xblocks]

    def run(Xb):
        res = greedy.batch_omp(Dj, Xb, T, dense=False)
        # scalar checksum: fetching it forces completion of the whole step
        return res, jnp.sum(res.err)

    # Warm up compile, the device->host fetch path, AND every input buffer:
    # on this machine's tunneled backend block_until_ready returns early,
    # the first host fetch pays a large one-time cost, and first-touch of
    # each device buffer is slow — so do one full untimed pass, syncing via
    # scalar fetches.
    for Xb in blocks:
        _, chk = run(Xb)
        float(np.asarray(chk))

    best = np.inf
    # best-of-5: same-session throughput can swing ~20% on the tunneled
    # backend (measured r3); more reps cost ~50 ms each and tighten the
    # capture
    for _ in range(5):
        t0 = time.perf_counter()
        chks = [run(Xb)[1] for Xb in blocks]
        total = jnp.sum(jnp.stack(chks))   # depends on every block's result
        float(np.asarray(total))
        best = min(best, time.perf_counter() - t0)
    multi = len(blocks) * blocks[0].shape[1] / best

    # production shape: the SAME patches as ONE whole-batch dispatch (the
    # kernel grids over 512-lane blocks internally) — at N=1e6 the
    # per-dispatch host overhead capped the chunked form 3x below the
    # single-dispatch rate (benchmarks/results/huge_n_compact.json, r4)
    Xall = jnp.concatenate(blocks, axis=1)
    _, chk = run(Xall)
    float(np.asarray(chk))
    best1 = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _, chk = run(Xall)
        float(np.asarray(chk))
        best1 = min(best1, time.perf_counter() - t0)
    single = Xall.shape[1] / best1

    # sustained shape: one 1M-patch dispatch.  The 262k dispatch spends
    # ~31 ms (the tunnel round trip) of its ~52 ms wall — the sustained
    # kernel rate only shows once compute dominates the fetch latency
    # (8.4M patches/s at N=1e6 vs 5.1M at 262k, r4 huge_n_compact.json).
    # Device-side concat of 4 reshuffled copies: no extra 768 MB host
    # transfer, and the lane blocks differ so the kernel cannot reuse
    # per-block state.
    key = jax.random.PRNGKey(0)
    perms = [
        jax.random.permutation(k, Xall.shape[1])
        for k in jax.random.split(key, 3)
    ]
    Xbig = jnp.concatenate(
        [Xall] + [Xall[:, pm] for pm in perms], axis=1
    )
    _, chk = run(Xbig)
    float(np.asarray(chk))
    bestb = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _, chk = run(Xbig)
        float(np.asarray(chk))
        bestb = min(bestb, time.perf_counter() - t0)
    big = Xbig.shape[1] / bestb
    return multi, single, big


def main():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    Xcpu = rng.standard_normal((P, CPU_N))
    cpu_pps = measure_cpu_oracle(D, Xcpu)

    Xblocks = [
        rng.standard_normal((P, TPU_BLOCK)).astype(np.float32)
        for _ in range(TPU_STEPS)
    ]
    multi_pps, single_pps, big_pps = measure_tpu(D, Xblocks)
    tpu_pps = max(multi_pps, single_pps, big_pps)

    import jax

    result = {
        "metric": f"batch_omp_throughput_K{K}_T{T}",
        "value": round(tpu_pps, 1),
        "unit": "patches/s",
        "vs_baseline": round(tpu_pps / cpu_pps, 2),
    }
    detail = {
        **result,
        "cpu_oracle_patches_per_sec": round(cpu_pps, 1),
        "device": str(jax.devices()[0]),
        "patch_dim": P,
        "n_atoms": K,
        "sparsity": T,
        "tpu_block": TPU_BLOCK,
        "tpu_patches_timed": TPU_BLOCK * TPU_STEPS,
        "chunked_8x32k_patches_per_sec": round(multi_pps, 1),
        "single_dispatch_262k_patches_per_sec": round(single_pps, 1),
        "single_dispatch_1m_patches_per_sec": round(big_pps, 1),
    }
    from benchmarks import stamp
    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/latest.json", "w") as f:
        json.dump(stamp(detail), f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
