"""Feature-sign outer-budget A/B on chip (r6).

    python -m benchmarks.ab_fs_maxiter

profile_fs.json: ~98% of lanes converge inside the first 16-outer-
iteration segment, but the 2% stragglers keep up to 6 more segments
running at FULL width (compaction measured neutral: per-segment host
fetch + narrow compiles eat the saving).  The polish guard (device-side
FISTA-500, taken only when its objective is better) already covers
unconverged lanes — so a smaller max_iter converts straggler segments
into one cheap polish.  The gate is the objective: limit-cycling lanes
usually sit ~1e-6 from the optimum, but a lane stopped mid-growth is
NOT recovered by 500 FISTA iterations for free — parity to ~1e-5 rel
decides the default.  Writes benchmarks/results/ab_fs_maxiter.json.
"""

import json
import pathlib
import time

import numpy as np
import jax.numpy as jnp

from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync

LAM, BLOCK = 0.15, 4096


def main():
    from lyssandra_tpu.solvers.lasso import feature_sign

    N = 16384
    res = {"shape": {"N": N, "lam": LAM, "block": BLOCK}}
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        def run(mi):
            outs = [feature_sign(Dd, b, LAM, full_result=True,
                                 max_iter=mi) for b in blocks]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for mi in (100, 48, 32, 16):
            _sync(run(mi)[0])
            best, g, d = np.inf, None, None
            for _ in range(3):
                t0 = time.perf_counter()
                g, d = run(mi)
                _sync(g)
                best = min(best, time.perf_counter() - t0)
            om = obj_mean(g)
            if base_obj is None:
                base_obj = om
            sect[f"maxiter{mi}"] = {
                "seconds": round(best, 3), "pps": round(N / best, 1),
                "done_frac": float(np.asarray(d).mean()), "obj_mean": om,
                "obj_rel_vs_base": (om - base_obj) / abs(base_obj),
            }
            print(json.dumps({f"{kind}.maxiter{mi}":
                              sect[f'maxiter{mi}']}), flush=True)
        res[kind] = sect
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_maxiter.json"
    out.write_text(json.dumps(res, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
