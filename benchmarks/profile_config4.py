"""Where do config-4's end-to-end seconds go? (VERDICT r4 task #3.)

Context: the standalone dispatch-level feature-sign coder reached
28.1k p/s (fused Pallas depth-28 cold start, ab_fs_fused.json) while the
regenerated config4.json read 6,810 p/s END-TO-END — and no committed
profile said where the other half of the time went.  The structural
fact: the epoch runs as ONE device program per 8-minibatch chunk
(`_online_chunk` lax.scan), whose in-scan coder is the traceable
while_loop `feature_sign_scan` — the dispatch-level coder's segmented
host continuation, Pallas cold-start kernel, and straggler polish
CANNOT run inside a lax.scan body, and every in-scan import of its
tricks measured a LOSS (cold_unroll: ab_online_unroll.json monotone
loss; warm_start: r6 negative; both documented in config.py).

Decomposition protocol: run config-4's exact fit, capture the per-chunk
seconds the learner already records, then re-time each chunk component
standalone at the FINAL dictionary (hardest regime: coherence grows as
atoms train) — in-scan coder call, sufficient-statistic matmuls,
Gauss-Seidel atom sweep, holdout FISTA objective — all warm.

    python -m benchmarks.profile_config4
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    import jax
    import jax.numpy as jnp

    leaves = [t for t in jax.tree.leaves(x) if hasattr(t, "dtype")]
    return float(np.asarray(sum(jnp.sum(jnp.abs(t)) for t in leaves)))


def _best_of(fn, n=3):
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax.numpy as jnp

    from lyssandra_tpu import OnlineDLConfig
    from lyssandra_tpu.dict_learning import OnlineDictionaryLearner
    from lyssandra_tpu.dict_learning.online import (
        _dict_update_body, _online_chunk, holdout_objective,
    )
    from lyssandra_tpu.solvers.lasso import feature_sign_scan
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image
    import jax

    n, K, bs = 100000, 1024, 4096
    n_hold = 2048
    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=n + n_hold,
                      seed=1).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    X, Xhold = X[:, :n], X[:, n:]
    cfg = OnlineDLConfig(K=K, lam=0.15, batch_size=bs)
    learner = OnlineDictionaryLearner(cfg)

    # config-4's exact protocol: warm-up fit compiles every executable
    learner.fit(X[:, : bs * cfg.chunk_batches], holdout=Xhold)
    learner.state = None
    learner.history_ = []
    t0 = time.perf_counter()
    learner.fit(X, n_epochs=1, holdout=Xhold)
    fit_dt = time.perf_counter() - t0
    n_coded = (n // bs) * bs
    chunk_seconds = [h["seconds"] for h in learner.history_]

    res = {
        "protocol": ("config-4 exact fit (warm), then each chunk "
                     "component re-timed standalone at the FINAL "
                     "dictionary, best-of-3 warm"),
        "fit_seconds": round(fit_dt, 2),
        "end_to_end_patches_per_sec": round(n_coded / fit_dt, 1),
        "chunk_seconds": [round(s, 3) for s in chunk_seconds],
        "chunk_seconds_sum": round(sum(chunk_seconds), 2),
        "outside_chunks_seconds": round(fit_dt - sum(chunk_seconds), 2),
    }

    # --- component re-timing at the final state ---
    st = learner.state
    D = st.D
    Xb = jnp.asarray(X[:, :bs])
    fs_opts = dict(max_active=cfg.fs_max_active, max_iter=cfg.fs_max_iter,
                   max_inner=cfg.fs_max_inner, warm_start=0, cold_unroll=0)

    cb = cfg.code_blocks
    p, sub = Xb.shape[0], bs // cb
    Xs = jnp.moveaxis(Xb.reshape(p, cb, sub), 1, 0)
    code = jax.jit(lambda D, Xs: jax.lax.map(
        lambda Xi: feature_sign_scan(D, Xi, cfg.lam, **fs_opts), Xs))
    _sync(code(D, Xs))
    t_code = _best_of(lambda: _sync(code(D, Xs)))

    Gamma = jnp.moveaxis(code(D, Xs), 0, 1).reshape(K, bs)
    _HI = jax.lax.Precision.HIGHEST
    stats = jax.jit(lambda A, B, G, Xb: (
        A + jnp.matmul(G, G.T, precision=_HI),
        B + jnp.matmul(Xb, G.T, precision=_HI)))
    _sync(stats(st.A, st.B, Gamma, Xb))
    t_stats = _best_of(lambda: _sync(stats(st.A, st.B, Gamma, Xb)))

    upd = jax.jit(lambda D, A, B: _dict_update_body(D, A, B, cfg.n_sweeps))
    _sync(upd(D, st.A, st.B))
    t_upd = _best_of(lambda: _sync(upd(D, st.A, st.B)))

    Xh = jnp.asarray(Xhold)
    _sync(holdout_objective(D, Xh, cfg.lam))
    t_hold = _best_of(lambda: _sync(holdout_objective(D, Xh, cfg.lam)))

    nb_total = n // bs
    n_chunks = (nb_total + cfg.chunk_batches - 1) // cfg.chunk_batches
    per_batch = {
        "coder_inscan_seconds": round(t_code, 3),
        "stats_matmuls_seconds": round(t_stats, 4),
        "dict_update_seconds": round(t_upd, 4),
    }
    model_chunks = nb_total * (t_code + t_stats + t_upd)
    res.update({
        "per_minibatch_warm": per_batch,
        "holdout_objective_seconds": round(t_hold, 3),
        "n_minibatches": nb_total,
        "n_chunks": n_chunks,
        "model_seconds": {
            "coding": round(nb_total * t_code, 2),
            "stats": round(nb_total * t_stats, 2),
            "dict_update": round(nb_total * t_upd, 2),
            "holdout": round(n_chunks * t_hold, 2),
            "sum": round(model_chunks + n_chunks * t_hold, 2),
        },
        "coder_inscan_patches_per_sec": round(bs / t_code, 1),
        "note": (
            "the in-scan coder is feature_sign_scan (bounded while_loop "
            "+ on-device FISTA polish) per 1024-lane lax.map sub-block: "
            "the 28.1k p/s dispatch-level coder's segmented host "
            "continuation and fused Pallas cold start cannot run inside "
            "a lax.scan body, and each of its tricks measured a loss "
            "when imported in-scan (cold_unroll: ab_online_unroll.json "
            "monotone loss; warm_start: r6 negative; code_blocks=4 IS "
            "in-scan straggler isolation and is on).  The component "
            "model above says whether the gap to the dispatch coder is "
            "coding time or overhead."),
    })
    print(json.dumps(res, indent=1))
    from benchmarks import write_result

    print("wrote", write_result("profile_config4", res))


if __name__ == "__main__":
    main()
