"""Feature-sign unrolled cold-start A/B on chip (r8, VERDICT r2 task #1a).

    python -m benchmarks.ab_fs_unroll [--quick]

Variants: cold_unroll in {0, 4, 6, 8} x n_refine in {1, 2} on both
regimes (config-4 real-color-patch data dictionary, coherent
synthetic).  cold_unroll=t runs the first t activations as statically
unrolled compact-width steps (c-dim CG on (N, c, c) systems, compact
line search, residual-form full gradient — see
solvers/lasso.py _fs_unrolled_state) before handing stragglers to the
segmented while_loop.  Mean final nnz at config-4 is ~4.5, so most
lanes should finish INSIDE the unroll and never pay a wide
(N, 64, 64) einsum.

Quality gate: mean objective within ~1e-5 relative of the cold
baseline and done_frac not regressing (the unroll's exit criteria are
the full KKT conditions, identical to the cold path).  Writes
benchmarks/results/ab_fs_unroll.json.
"""

import argparse
import json
import pathlib
import time

import numpy as np
import jax.numpy as jnp

from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync

LAM, BLOCK = 0.15, 2048


def main(quick=False):
    from lyssandra_tpu.solvers.lasso import feature_sign

    N = 8192 if quick else 16384
    variants = [(0, 2), (4, 1), (4, 2), (6, 1), (6, 2), (8, 2)]
    res = {"shape": {"N": N, "lam": LAM, "block": BLOCK},
           "variants": [f"un{u}_rf{r}" for u, r in variants]}
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        def run(unroll, refine):
            outs = [feature_sign(Dd, b, LAM, full_result=True,
                                 cold_unroll=unroll, n_refine=refine,
                                 warm_start=0)
                    for b in blocks]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for unroll, refine in variants:
            _sync(run(unroll, refine)[0])        # warmup/compile
            best, g, d = np.inf, None, None
            for _ in range(3):
                t0 = time.perf_counter()
                g, d = run(unroll, refine)
                _sync(g)
                best = min(best, time.perf_counter() - t0)
            om = obj_mean(g)
            if base_obj is None:
                base_obj = om
            tag = f"un{unroll}_rf{refine}"
            sect[tag] = {
                "seconds": round(best, 3),
                "pps": round(N / best, 1),
                "done_frac": float(np.asarray(d).mean()),
                "obj_mean": om,
                "obj_rel_vs_base": (om - base_obj) / abs(base_obj),
            }
            print(json.dumps({f"{kind}.{tag}": sect[tag]}), flush=True)
        res[kind] = sect
    print(json.dumps(res))
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_unroll.json"
    out.write_text(json.dumps(res, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
