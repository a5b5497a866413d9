"""Chip A/B: fused Pallas feature-sign cold start vs the XLA unroll.

    python -m benchmarks.ab_fs_fused [--quick]

Same protocol as ab_fs_unroll2 (config-4 + coherent regimes, 2048-lane
dispatch blocks, warm best-of-3, objective parity vs the XLA-un28 chip
default).  The question: does the VMEM-resident kernel (a) beat the XLA
unroll at equal depth, and (b) support DEEPER depths profitably — the
XLA form's O(t^2) graph makes depth 28 cost ~160 s of CPU compile per
shape, while the kernel's row ops live in one Mosaic program.

Writes benchmarks/results/ab_fs_fused.json.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync

LAM, BLOCK = 0.15, 2048


def main(quick=False):
    from lyssandra_tpu.solvers.lasso import (
        feature_sign, _fs_unrolled_state_fused,
    )

    N = 8192 if quick else 16384
    variants = [
        ("xla_un28", dict(cold_unroll=28)),
        ("xla_un12", dict(cold_unroll=12)),
        ("pal_un8", dict(cold_unroll=8, cold_backend="pallas")),
        ("pal_un12", dict(cold_unroll=12, cold_backend="pallas")),
        ("pal_un16", dict(cold_unroll=16, cold_backend="pallas")),
        ("pal_un20", dict(cold_unroll=20, cold_backend="pallas")),
        ("pal_un24", dict(cold_unroll=24, cold_backend="pallas")),
        ("pal_un28", dict(cold_unroll=28, cold_backend="pallas")),
        ("pal_un32", dict(cold_unroll=32, cold_backend="pallas")),
    ]
    res = {"shape": {"N": N, "lam": LAM, "block": BLOCK}}
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        # done-fraction at the fused handoff per depth (one block)
        Dt = Dd.T
        Xt = blocks[0].T
        A0 = jnp.matmul(Xt, Dd, precision=jax.lax.Precision.HIGHEST)
        hand = {}
        for depth in (8, 12, 16, 20, 24, 28, 32):
            st = _fs_unrolled_state_fused(
                Dt, Xt, A0, LAM, t_unroll=depth, n_refine=2,
                max_active=64)
            hand[f"pal_un{depth}"] = float(np.asarray(st[5]).mean())
        res.setdefault("done_at_handoff", {})[kind] = hand
        print(json.dumps({f"{kind}.done_at_handoff": hand}), flush=True)

        def run(**kw):
            outs = [feature_sign(Dd, b, LAM, full_result=True,
                                 warm_start=0, **kw)
                    for b in blocks]
            return jnp.concatenate([o.Gamma for o in outs], axis=1)

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for tag, kw in variants:
            try:
                t0 = time.perf_counter()
                _sync(run(**kw))
                cold = time.perf_counter() - t0
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    G = run(**kw)
                    _sync(G)
                    best = min(best, time.perf_counter() - t0)
                obj = obj_mean(G)
                if base_obj is None:
                    base_obj = obj
                sect[tag] = {
                    "seconds": round(best, 3),
                    "pps": round(N / best, 1),
                    "cold_seconds": round(cold, 1),
                    "obj_mean": obj,
                    "obj_rel_vs_base": (obj - base_obj)
                    / max(abs(base_obj), 1e-12),
                }
            except Exception as e:  # noqa: BLE001 — record compile fails
                sect[tag] = {"error": str(e)[:300]}
            print(json.dumps({f"{kind}.{tag}": sect[tag]}), flush=True)
        res[kind] = sect

    from benchmarks import write_result

    print("wrote", write_result("ab_fs_fused", res))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
