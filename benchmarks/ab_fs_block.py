"""Feature-sign lane-block-size A/B on chip (r6).

    python -m benchmarks.ab_fs_block

The r4 fact "4096-lane blocks beat one 32k call by 27%" (encoder block
default for convex routes) was measured with max_inner=20, where each
outer iteration paid up to 20 straggler-ridden refinements.  r6's
max_inner=6 default cuts the straggler tax per outer iteration ~3x, so
the block-size trade (straggler riding vs per-dispatch latency and
einsum efficiency) may have moved — a measured tuning EXPIRES when the
op mix changes (CLAUDE.md, r5 lesson).  Writes
benchmarks/results/ab_fs_block.json.
"""

import json
import pathlib
import time

import numpy as np
import jax.numpy as jnp

from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync

LAM = 0.15


def main():
    from lyssandra_tpu.solvers.lasso import feature_sign

    N = 16384
    res = {"shape": {"N": N, "lam": LAM}}
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)

        def run(block):
            outs = [feature_sign(Dd, Xd[:, i:i + block], LAM,
                                 full_result=True)
                    for i in range(0, N, block)]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for block in (2048, 4096, 8192, 16384):
            _sync(run(block)[0])
            best, g, d = np.inf, None, None
            for _ in range(3):
                t0 = time.perf_counter()
                g, d = run(block)
                _sync(g)
                best = min(best, time.perf_counter() - t0)
            om = obj_mean(g)
            if base_obj is None:
                base_obj = om
            sect[f"block{block}"] = {
                "seconds": round(best, 3), "pps": round(N / best, 1),
                "done_frac": float(np.asarray(d).mean()), "obj_mean": om,
                "obj_rel_vs_base": (om - base_obj) / abs(base_obj),
            }
            print(json.dumps({f"{kind}.block{block}":
                              sect[f'block{block}']}), flush=True)
        res[kind] = sect
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_block.json"
    out.write_text(json.dumps(res, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
