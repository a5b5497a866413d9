"""On-chip A/B: online-DL coding step — feature-sign vs FISTA.

    python -m benchmarks.ab_online_coder

The Mairal sufficient-statistics update is coder-agnostic; feature-sign
is the exact active-set solver (the reference's choice) while FISTA is
an approximate first-order coder at a fraction of the cost.  If the
holdout lasso objective after one config-4-scale epoch matches, the
fast coder is a legitimate default for throughput-bound training.
Fairness: identical data order (same seed), identical holdout metric
(FISTA-coded lasso objective on a fixed set).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def main():
    from lyssandra_tpu import OnlineDLConfig
    from lyssandra_tpu.dict_learning import OnlineDictionaryLearner
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    n, K, bs = 100_000, 1024, 4096
    n_hold = 2048
    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=n + n_hold,
                      seed=1).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    X, Xhold = X[:, :n], X[:, n:]

    out = {}
    for coder in ("feature_sign", "fista"):
        cfg = OnlineDLConfig(K=K, lam=0.15, batch_size=bs)
        learner = OnlineDictionaryLearner(cfg, coder=coder)
        # warm-up compile outside the timed region
        learner.fit(X[:, : bs * cfg.chunk_batches], holdout=Xhold)
        learner.state = None
        learner.history_ = []
        t0 = time.perf_counter()
        learner.fit(X, n_epochs=1, holdout=Xhold, seed=0)
        dt = time.perf_counter() - t0
        n_coded = (n // bs) * bs
        out[coder] = {
            "seconds": round(dt, 2),
            "patches_per_sec": round(n_coded / dt, 1),
            "holdout_objective_trace": [
                round(h["holdout_objective"], 6) for h in learner.history_
            ],
            "avg_nnz_last": round(learner.history_[-1]["avg_nnz"], 2),
        }
        print(coder, out[coder])
    out["fista_speedup"] = round(
        out["fista"]["patches_per_sec"]
        / out["feature_sign"]["patches_per_sec"], 2
    )
    out["holdout_final_ratio"] = round(
        out["fista"]["holdout_objective_trace"][-1]
        / out["feature_sign"]["holdout_objective_trace"][-1], 5
    )

    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "ab_online_coder.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
