"""On-chip A/B: online-DL minibatch size at the config-4 operating point.

    python -m benchmarks.ab_online_bs

VERDICT r1 suggested batch_size >= 8192 to fill the chip (4096 lanes is
~12% of the 32k-lane sweet spot).  Mairal's algorithm is sequential in
minibatches, so larger batches trade update frequency for per-dispatch
utilization; the holdout lasso objective after one epoch is the
convergence-fairness check.
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
    from lyssandra_tpu.utils import patch_dataset, synthetic_image

    n, K = 100000, 1024
    n_hold = 2048
    chans = [synthetic_image("texture", 256, seed=s) for s in range(3)]
    Xc = [patch_dataset([c], p=8, n_patches=n + n_hold, seed=1)
          for c in chans]
    X = np.concatenate(Xc, axis=0).astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    X, Xhold = X[:, :n], X[:, n:]

    out = {}
    for bs in (4096, 8192, 16384):
        cfg = OnlineDLConfig(K=K, lam=0.15, batch_size=bs,
                             chunk_batches=max(1, 32768 // bs))
        learner = OnlineDictionaryLearner(cfg)
        # warm-up compile on one chunk
        learner.fit(X[:, : bs * cfg.chunk_batches], holdout=Xhold)
        learner.state = None
        learner.history_ = []
        t0 = time.perf_counter()
        learner.fit(X, n_epochs=1, holdout=Xhold)
        dt = time.perf_counter() - t0
        n_coded = (n // bs) * bs
        rec = {
            "batch_size": bs,
            "tpu_seconds": round(dt, 2),
            "patches_per_sec": round(n_coded / dt, 1),
            "holdout_objective_trace": [
                round(h["holdout_objective"], 6) for h in learner.history_
            ],
            "avg_nnz_last": round(learner.history_[-1]["avg_nnz"], 2),
        }
        out[f"bs{bs}"] = rec
        print(json.dumps(rec))

    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "ab_online_bs.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
