"""Feature-sign A/B on chip: activation width x CG budget.

    python -m benchmarks.ab_fs_activate [--quick]

r6 hypothesis, from profile_fs.json's phase decomposition: a warm
segment costs ~(outer iters) x (inner refinements, straggler-ridden to
max_inner) x (CG ~1.2 ms + line search ~1.0 ms).  Two knobs attack the
two factors independently:

  - ``n_activate``: activate the top-k KKT violators per outer
    iteration instead of one.  A lane whose optimum has s nonzeros
    needs >= ceil(s/k) outer iterations instead of >= s; since every
    outer iteration pays a full straggler-ridden inner loop, cutting
    the outer count multiplies through.  Same optimum (lasso minimizer
    is path-independent; each candidate individually clears the
    activation threshold; refinement prunes mistakes).
  - ``max_cg``: cap the inner masked-solve CG budget.  The solve is
    warm-started from the previous refinement, so its accuracy
    accumulates ACROSS refinements — a tighter cap trades marginally
    more refinements for much cheaper ones when one straggler lane
    keeps the `jnp.any(rs > 1e-12)` loop alive.

Both regimes from ab_fs_design are measured (real-color-patch data
dictionary = the config-4 operating point, plus the coherent synthetic
regime that broke warm starts in r4).  Quality gate: every variant's
mean objective must match the (n_act=1, cg=32) baseline to ~1e-5
relative, and done_frac must not regress.  Writes
benchmarks/results/ab_fs_activate.json.
"""

import argparse
import json
import pathlib
import time

import numpy as np
import jax.numpy as jnp

P, K, LAM, BLOCK = 192, 1024, 0.15, 4096


def _sync(x):
    return float(np.asarray(jnp.sum(jnp.abs(x))))


def make_coherent(n):
    rng = np.random.default_rng(1)
    base = rng.standard_normal((P, 64))
    D = np.repeat(base, K // 64, axis=1)
    D += 0.15 * rng.standard_normal((P, K))
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    D = D.astype(np.float32)
    G0 = np.zeros((K, n), np.float32)
    for i in range(n):
        sup = rng.choice(K, size=8, replace=False)
        G0[sup, i] = rng.standard_normal(8)
    X = (D @ G0 + 0.05 * rng.standard_normal((P, n))).astype(np.float32)
    return jnp.asarray(D), jnp.asarray(X)


def make_config4(n):
    from lyssandra_tpu.ops.dictionaries import init_dictionary
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=n, seed=1).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    Xj = jnp.asarray(X)
    D = init_dictionary(Xj, K, "data", 0)
    return D, Xj


def main(quick=False):
    from lyssandra_tpu.solvers.lasso import feature_sign

    N = 8192 if quick else 16384
    variants = [(1, 32), (2, 32), (4, 32), (8, 32), (1, 12), (4, 12)]
    res = {"shape": {"p": P, "K": K, "N": N, "lam": LAM, "block": BLOCK},
           "variants": [f"act{a}_cg{c}" for a, c in variants]}
    for kind, make in (("config4", make_config4),
                       ("coherent", make_coherent)):
        Dd, Xd = make(N)
        blocks = [Xd[:, i * BLOCK:(i + 1) * BLOCK]
                  for i in range(N // BLOCK)]

        def run(n_act, cg):
            outs = [feature_sign(Dd, b, LAM, full_result=True,
                                 n_activate=n_act, max_cg=cg)
                    for b in blocks]
            return (jnp.concatenate([o.Gamma for o in outs], axis=1),
                    jnp.concatenate([o.done for o in outs]))

        def obj_mean(G):
            R = Xd - Dd @ G
            return float(np.asarray(
                jnp.sum(R * R, axis=0) + LAM * jnp.sum(jnp.abs(G), axis=0)
            ).mean())

        sect, base_obj = {}, None
        for n_act, cg in variants:
            _sync(run(n_act, cg)[0])            # warmup/compile
            best, g, d = np.inf, None, None
            for _ in range(3):
                t0 = time.perf_counter()
                g, d = run(n_act, cg)
                _sync(g)
                best = min(best, time.perf_counter() - t0)
            om = obj_mean(g)
            if base_obj is None:
                base_obj = om
            tag = f"act{n_act}_cg{cg}"
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
    out = pathlib.Path(__file__).parent / "results" / "ab_fs_activate.json"
    out.write_text(json.dumps(res, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
