"""Feature-sign unroll depth sweep + handoff tuning (r8 follow-up).

    python -m benchmarks.ab_fs_unroll2 [--quick]

ab_fs_unroll showed the unrolled cold start winning monotonically
through un8 (config-4: 7.1k -> 9.7k p/s).  This sweep pushes depth
(10, 12 — the O(t^2) compile-time gate says ~10 is the edge), and
re-tests straggler compaction at the handoff: with the unroll
finishing most lanes, the while_loop segment sees only stragglers,
the regime where compact_stragglers was designed to pay (it was
net-negative in r4 when 97.8% of lanes still rode segment 0).

Also reports done_frac_at_handoff per depth (direct _fs_unrolled_state
probe) so the depth choice is explainable.  Writes
benchmarks/results/ab_fs_unroll2.json.
"""

import argparse
import json
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync

LAM, BLOCK = 0.15, 2048


def main(quick=False):
    from lyssandra_tpu.solvers.lasso import feature_sign, _fs_unrolled_state
    from lyssandra_tpu.solvers.lasso import _HI  # noqa: F401

    N = 8192 if quick else 16384
    # cold_backend explicit: this harness measures the XLA unroll depth
    # curve; since the r4 default flip, leaving it implicit would run
    # the fused Pallas builder on TPU (the ab_fs_fused.py r5 lesson)
    variants = [
        ("un8_rf2", dict(cold_unroll=8, n_refine=2, cold_backend="xla")),
        ("un10_rf2", dict(cold_unroll=10, n_refine=2,
                          cold_backend="xla")),
        ("un12_rf2", dict(cold_unroll=12, n_refine=2,
                          cold_backend="xla")),
        ("un8_rf2_cs", dict(cold_unroll=8, n_refine=2,
                            cold_backend="xla",
                            compact_stragglers=True)),
        ("un10_rf2_cs", dict(cold_unroll=10, n_refine=2,
                             cold_backend="xla",
                             compact_stragglers=True)),
    ]
    res = {"shape": {"N": N, "lam": LAM, "block": BLOCK}}
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        # done-fraction at handoff per depth (one block is representative)
        Dt = Dd.T
        Xt = blocks[0].T
        A0 = jnp.matmul(Xt, Dd, precision=jax.lax.Precision.HIGHEST)
        hand = {}
        for depth in (4, 6, 8, 10, 12):
            st = _fs_unrolled_state(Dt, Xt, A0, LAM, t_unroll=depth,
                                    n_refine=2, max_active=64)
            hand[f"un{depth}"] = float(np.asarray(st[5]).mean())
        res.setdefault("done_at_handoff", {})[kind] = hand
        print(json.dumps({f"{kind}.done_at_handoff": hand}), flush=True)

        def run(**kw):
            outs = [feature_sign(Dd, b, LAM, full_result=True,
                                 warm_start=0, **kw)
                    for b in blocks]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for tag, kw in variants:
            _sync(run(**kw)[0])
            best, g, d = np.inf, None, None
            for _ in range(3):
                t0 = time.perf_counter()
                g, d = run(**kw)
                _sync(g)
                best = min(best, time.perf_counter() - t0)
            om = obj_mean(g)
            if base_obj is None:
                base_obj = om
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
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_unroll2.json"
    out.write_text(json.dumps(res, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
