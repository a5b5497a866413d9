"""Per-phase decomposition of a K-SVD iteration at config-2 shape, on chip.

    python -m benchmarks.profile_ksvd [--quick]

VERDICT r1 #1: coding ran 4408x the oracle but learning only ~440x, with
no committed profile of the learning loop.  This does for ksvd_step what
profile_bomp did for the solver: time coding / atom sweep / replacement /
stats fetch separately (warm, best-of-N, one checksum sync per probe —
the axon tunnel costs ~31 ms per host round trip, so phases are repeated
back-to-back and synced once), A/B the r1-r3 Gamma-contraction sweep
against the r4 residual-form sweep at several atom_block sizes, and run
the full 20-iteration config-2 fit for the headline number.

Also records the block-sweep CONVERGENCE check on chip: objective traces
for atom_block=1 vs the fast block size over the full fit (monotonicity +
final-objective ratio) — the evidence behind the iteration-level-tolerance
decision (SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")

P, K, N, T, N_ITER = 8, 512, 50_000, 8, 20


def _sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.sum(x)))


def _best_of(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def legacy_atom_update(X, D, Gamma, n_power=1):
    """The r1-r3 sweep (Gamma-contraction form), inlined for the A/B."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    _HI = lax.Precision.HIGHEST

    @jax.jit
    def run(X, D, Gamma):
        Kk = D.shape[1]

        def update_atom(carry, k):
            D, Gamma = carry
            gk = lax.dynamic_slice_in_dim(Gamma, k, 1, axis=0)[0]
            m = (jnp.abs(gk) > 0).astype(X.dtype)
            dk = lax.dynamic_slice_in_dim(D, k, 1, axis=1)[:, 0]
            nusers = jnp.sum(m)

            def ekg(g):
                gm = g * m
                return (jnp.matmul(X, gm, precision=_HI)
                        - jnp.matmul(D, jnp.matmul(Gamma, gm,
                                                   precision=_HI),
                                     precision=_HI)
                        + dk * jnp.dot(gk, gm))

            def ektd(d):
                return m * (jnp.matmul(X.T, d, precision=_HI)
                            - jnp.matmul(Gamma.T,
                                         jnp.matmul(D.T, d, precision=_HI),
                                         precision=_HI)
                            + gk * jnp.dot(dk, d))

            def power_step(dg, _):
                _, g = dg
                d = ekg(g)
                d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
                return (d, ektd(d)), None

            (d_new, g_new), _ = lax.scan(
                power_step, (dk, gk * m), None, length=n_power
            )
            ok = nusers > 0
            d_new = jnp.where(ok, d_new, dk)
            g_new = jnp.where(ok, g_new, gk)
            D = lax.dynamic_update_slice_in_dim(
                D, d_new[:, None], k, axis=1
            )
            Gamma = lax.dynamic_update_slice_in_dim(
                Gamma, g_new[None, :], k, axis=0
            )
            return (D, Gamma), None

        (D2, G2), _ = lax.scan(update_atom, (D, Gamma), jnp.arange(Kk))
        return D2, G2

    return run(X, D, Gamma)


def main(quick=False):
    import jax
    import jax.numpy as jnp

    from lyssandra_tpu.config import KSVDConfig
    from lyssandra_tpu.dict_learning.ksvd import (
        KSVDLearner, ksvd_atom_update,
    )
    from lyssandra_tpu.ops.dictionaries import (
        init_dictionary, normalize_atoms, replace_unused_atoms,
    )
    from lyssandra_tpu.solvers.encoder import SparseEncoder
    from lyssandra_tpu.utils import patch_dataset, standard_test_image

    n = 20_000 if quick else N
    n_iter = 6 if quick else N_ITER
    out = {"shape": dict(p=P * P, K=K, N=n, T=T, n_iter=n_iter),
           "device": str(jax.devices()[0])}

    imgs = [standard_test_image("barbara", 512),
            standard_test_image("lena", 512)]
    X = jnp.asarray(
        patch_dataset(imgs, p=P, n_patches=n, seed=0), jnp.float32
    )
    D0 = init_dictionary(X, K, "data", 0)
    enc = SparseEncoder("bomp", {"T": T}, check_atoms=False)

    # one warm coding pass gives realistic codes for the sweep probes
    Gamma = enc.encode(X, D0)
    _sync(Gamma)

    # --- phase: coding -------------------------------------------------
    out["coding_s"] = _best_of(lambda: _sync(enc.encode(X, D0)))

    # --- phase: atom sweep, legacy vs residual-form at block sizes -----
    t0 = time.perf_counter()
    _sync(legacy_atom_update(X, D0, Gamma)[0])
    out["sweep_legacy_cold_s"] = time.perf_counter() - t0
    out["sweep_legacy_s"] = _best_of(
        lambda: _sync(legacy_atom_update(X, D0, Gamma)[0])
    )
    for B in (1, 8, 16, 32, 64):
        f = functools.partial(ksvd_atom_update, atom_block=B)
        t0 = time.perf_counter()
        _sync(f(X, D0, Gamma)[0])
        out[f"sweep_rform_b{B}_cold_s"] = round(
            time.perf_counter() - t0, 3
        )
        out[f"sweep_rform_b{B}_s"] = _best_of(
            lambda: _sync(f(X, D0, Gamma)[0])
        )

    # --- phase: replacement + normalize + stats ------------------------
    def repl():
        D2, bad = replace_unused_atoms(X, D0, Gamma, return_mask=True)
        return _sync(normalize_atoms(D2)) + _sync(bad.sum())

    repl()
    out["replace_s"] = _best_of(repl)

    def stats_fetch():
        R = X - D0 @ Gamma
        s = jnp.stack([(R * R).sum(), jnp.sqrt((R * R).mean())])
        return float(np.asarray(s)[0])

    stats_fetch()
    out["stats_fetch_s"] = _best_of(stats_fetch)

    # --- full fits: sequential vs block --------------------------------
    for tag, B in (("seq_b1", 1), ("blk_b16", 16), ("blk_b32", 32)):
        cfg = KSVDConfig(K=K, T=T, n_iter=n_iter, init="data",
                         atom_block=B, seed=0)
        KSVDLearner(cfg).fit(np.asarray(X))          # compile warm-up
        t0 = time.perf_counter()
        learner = KSVDLearner(cfg).fit(np.asarray(X))
        dt = time.perf_counter() - t0
        objs = [h["objective"] for h in learner.history_]
        out[f"fit_{tag}"] = {
            "warm_total_s": round(dt, 3),
            "s_per_iter": round(dt / n_iter, 4),
            "objective_first": objs[0], "objective_last": objs[-1],
            "monotone_1pct": all(
                objs[i + 1] <= objs[i] * 1.01
                for i in range(len(objs) - 1)
            ),
            "objectives": [round(o, 1) for o in objs],
        }
    out["blk16_vs_seq_final_obj_ratio"] = round(
        out["fit_blk_b16"]["objective_last"]
        / out["fit_seq_b1"]["objective_last"], 6
    )

    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, "profile_ksvd.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("wrote", path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
