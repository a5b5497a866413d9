"""Chip A/B: fused Pallas feature-sign cold start vs the XLA unroll.

    python -m benchmarks.ab_fs_fused [--quick] [--depths 8,12,...]

Same protocol as ab_fs_unroll2 (config-4 + coherent regimes, 2048-lane
dispatch blocks, warm best-of-3, objective parity vs the XLA-un28 chip
default).  The question: does the VMEM-resident kernel (a) beat the XLA
unroll at equal depth, and (b) support DEEPER depths profitably?

r4 correction to the r3 framing: the kernel does NOT erase the unroll's
compile tax.  The r3 artifact's pal cold_seconds (0.7-7 s) were
pre-warmed reads — the done_at_handoff loop had already compiled each
depth's kernel before the timed variants ran.  This harness now runs
the handoff probe AFTER the variants, so each pal cell's cold_seconds
IS the honest depth-vs-compile curve: fs_cold_fused costs ~24 s at
depth 8 rising to ~230 s at depth 20 and ~400 s at depth 24 (r4,
in-artifact), the same order as the XLA unroll's 53-160 s.  Both forms
pay O(depth^2) program size; the Pallas win, if any, is RUNTIME
(VMEM-resident state vs HBM-streamed XLA ops).

Robustness: every cell is written to the artifact AS SOON as it is
measured (the r3 run lost its decisive cells to a timeout that
discarded everything).

Writes benchmarks/results/ab_fs_fused.json.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync
from benchmarks import write_result

LAM, BLOCK = 0.15, 2048


def main(quick=False, depths=None, merge=False, skip_xla=False):
    from lyssandra_tpu.solvers.lasso import (
        feature_sign, _fs_unrolled_state_fused,
    )

    N = 8192 if quick else 16384
    pal_depths = depths or (8, 12, 16, 20, 24, 28)
    # cold_backend MUST be explicit on the xla rows: since the r4
    # default flip, cold_backend=None resolves to "pallas" on TPU — an
    # implicit variant spec would compare pallas against itself (caught
    # live in the r5 clean-tree regen: the "xla_un28" cell produced the
    # pallas obj bitwise and pre-warmed the pal_un28 kernel)
    variants = ([] if skip_xla else [
        ("xla_un28", dict(cold_unroll=28, cold_backend="xla")),
        ("xla_un12", dict(cold_unroll=12, cold_backend="xla")),
    ]) + [
        (f"pal_un{d}", dict(cold_unroll=d, cold_backend="pallas"))
        for d in pal_depths
    ]
    res = {"shape": {"N": N, "lam": LAM, "block": BLOCK},
           "note": ("pal cold_seconds = jit trace + Mosaic compile + "
                    "first run (honest: variants run BEFORE the "
                    "handoff-fraction pass reuses their kernels)")}
    if merge:
        # append-mode (e.g. a later --depths 32 probe): keep prior cells;
        # cross-session pps comparisons carry the documented ~20%
        # session swing — note it.
        import os

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "ab_fs_fused.json")
        if os.path.exists(path):
            with open(path) as f:
                prior = json.load(f)
            for k in ("config4", "coherent", "done_at_handoff"):
                if k in prior:
                    res[k] = prior[k]
            res["merge_note"] = ("cells appended across sessions; "
                                 "pps comparable only within a session "
                                 "(~20% swing)")
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

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

        sect = res.get(kind, {}) if merge else {}
        base_obj = (sect.get("xla_un28", {}).get("obj_mean")
                    if merge else None)
        res[kind] = sect
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
            write_result("ab_fs_fused", res)       # incremental commit

        # done-fraction at the fused handoff per depth (one block) —
        # AFTER the variants so each depth's kernel is already compiled
        # (feature_sign uses the same jitted fs_cold_fused executable at
        # this shape) and cold_seconds above stay honest
        Dt = Dd.T
        Xt = blocks[0].T
        A0 = jnp.matmul(Xt, Dd, precision=jax.lax.Precision.HIGHEST)
        hand = res.setdefault("done_at_handoff", {}).setdefault(kind, {})
        for depth in pal_depths:
            if f"pal_un{depth}" in sect and "error" in sect[f"pal_un{depth}"]:
                continue
            st = _fs_unrolled_state_fused(
                Dt, Xt, A0, LAM, t_unroll=depth, n_refine=2,
                max_active=64)
            hand[f"pal_un{depth}"] = float(np.asarray(st[5]).mean())
            write_result("ab_fs_fused", res)
        print(json.dumps({f"{kind}.done_at_handoff": hand}), flush=True)

    print("wrote", write_result("ab_fs_fused", res))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--depths", type=str, default=None,
                    help="comma-separated pallas depths")
    ap.add_argument("--merge", action="store_true",
                    help="append to the existing artifact")
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the xla baseline variants (merge mode)")
    a = ap.parse_args()
    main(quick=a.quick,
         depths=tuple(int(x) for x in a.depths.split(","))
         if a.depths else None,
         merge=a.merge, skip_xla=a.skip_xla)
