"""feature-sign OMP-seed warm start A/B (r6) — see results/ab_fs_ompseed.json.

Run: PYTHONPATH=/root/repo python benchmarks/ab_fs_ompseed.py
"""
import json, time
import numpy as np, jax.numpy as jnp
from benchmarks.ab_fs_activate import make_config4, make_coherent, _sync
from lyssandra_tpu.solvers.lasso import feature_sign
LAM, N, BLOCK = 0.15, 16384, 2048
for kind, make in (("config4", make_config4), ("coherent", make_coherent)):
    Dd, Xd = make(N)
    def run(ws, seed):
        outs = [feature_sign(Dd, Xd[:, i:i+BLOCK], LAM,
                             warm_start=ws, warm_seed=seed)
                for i in range(0, N, BLOCK)]
        return jnp.concatenate(outs, axis=1)
    def obj_mean(G):
        R = Xd - Dd @ G
        return float(np.asarray(jnp.sum(R*R,0) + LAM*jnp.sum(jnp.abs(G),0)).mean())
    base = None
    for ws, seed in ((0, "fista"), (4, "omp"), (8, "omp")):
        _sync(run(ws, seed))
        best, g = np.inf, None
        for _ in range(3):
            t0 = time.perf_counter(); g = run(ws, seed); _sync(g)
            best = min(best, time.perf_counter() - t0)
        om = obj_mean(g)
        if base is None: base = om
        tag = f"{seed}{ws}" if ws else "cold"
        print(json.dumps({f"{kind}.{tag}": {
            "seconds": round(best,3), "pps": round(N/best,1),
            "obj_rel_vs_cold": (om-base)/abs(base)}}), flush=True)
