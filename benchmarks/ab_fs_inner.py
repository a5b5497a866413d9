"""Feature-sign inner-loop budget A/B on chip (r6 follow-up to
ab_fs_activate): max_inner in {20, 10, 6, 3} at the config-4 operating
point, defaults otherwise.

Hypothesis: the inner refinement while_loop's `jnp.any(not_opt)` exit
rides each 4096-lane block's slowest lane, so most refinements execute
for lanes already at their KKT point; a tighter max_inner converts
straggler refinements (~2.1 ms each: CG + line search) into extra outer
iterations (~1 ms each: full-width gradient + active-set gather), which
could pay if stragglers dominate.  Quality gate: objective parity to
~1e-5 rel and done_frac — a budget too small to complete the post-
activation refinement limit-cycles instead.

Writes benchmarks/results/ab_fs_inner.json.
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
                                 max_inner=mi) for b in blocks]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for mi in (20, 10, 6, 3):
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
            sect[f"inner{mi}"] = {
                "seconds": round(best, 3), "pps": round(N / best, 1),
                "done_frac": float(np.asarray(d).mean()), "obj_mean": om,
                "obj_rel_vs_base": (om - base_obj) / abs(base_obj),
            }
            print(json.dumps({f"{kind}.inner{mi}": sect[f'inner{mi}']}),
                  flush=True)
        res[kind] = sect
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_inner.json"
    out.write_text(json.dumps(res, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
