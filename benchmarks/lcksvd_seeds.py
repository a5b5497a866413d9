"""LC-KSVD accuracy band across seeds (VERDICT r2 task #9).

config-5's acceptance bar is "accuracy parity (exact or +-noise)" — but
the +-noise needs a MEASURED noise: the committed single-seed numbers
(TPU 94.26%, oracle 95.0%) differ by less than the seed-to-seed spread
of the algorithm itself, which this harness quantifies.  Runs the full
config-5 protocol (same split, preprocessing, K/T/alpha/beta/n_iter as
benchmarks/run.py::config5) across >=5 dictionary-init seeds for BOTH
the TPU fast path and the fp64 oracle, and commits the two accuracy
distributions.  tests/test_artifacts.py asserts the committed config-5
accuracy sits inside the union band.

    python -m benchmarks.lcksvd_seeds [--skip-oracle]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
from sklearn.datasets import load_digits
from sklearn.model_selection import train_test_split

SEEDS = tuple(range(10))


def _split():
    digits = load_digits()
    X = digits.data.T.astype(np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-9)
    y = digits.target
    Xtr, Xte, ytr, yte = train_test_split(
        X.T, y, test_size=0.3, random_state=0, stratify=y
    )
    return Xtr.T, Xte.T, ytr, yte


def main(skip_oracle=False):
    from lyssandra_tpu import LCKSVD, LCKSVDConfig

    Xtr, Xte, ytr, yte = _split()

    import jax.numpy as jnp

    float(np.asarray(jnp.sum(jnp.zeros(()))))   # first-fetch warm-up

    tpu_accs, tpu_secs = [], []
    for s in SEEDS:
        t0 = time.perf_counter()
        lc = LCKSVD(
            LCKSVDConfig(K=500, T=8, n_iter=20, seed=s)
        ).fit(Xtr, ytr)
        dt = time.perf_counter() - t0
        acc = float(lc.score(Xte, yte))
        tpu_accs.append(acc)
        tpu_secs.append(round(dt, 1))
        print(json.dumps({"seed": s, "tpu_acc": acc, "s": round(dt, 1)}),
              flush=True)

    res = {
        "protocol": "config-5 digits, K=500 T=8 n_iter=20",
        "seeds": list(SEEDS),
        "tpu_accuracies": tpu_accs,
        "tpu_seconds": tpu_secs,
        "tpu_band": [min(tpu_accs), max(tpu_accs)],
    }

    if not skip_oracle:
        from benchmarks.lcksvd_oracle import run as oracle_run

        orc_accs = []
        for s in SEEDS:
            orc = oracle_run(K=500, T=8, n_iter=20, seed=s)
            orc_accs.append(orc["oracle_lcksvd_accuracy"])
            print(json.dumps({"seed": s,
                              "oracle_acc": orc_accs[-1]}), flush=True)
        res["oracle_accuracies"] = orc_accs
        res["oracle_band"] = [min(orc_accs), max(orc_accs)]
        lo = min(res["tpu_band"][0], res["oracle_band"][0])
        hi = max(res["tpu_band"][1], res["oracle_band"][1])
        res["union_band"] = [lo, hi]
        res["bands_overlap"] = bool(
            res["tpu_band"][0] <= res["oracle_band"][1]
            and res["oracle_band"][0] <= res["tpu_band"][1]
        )
        # paired analysis (VERDICT r3 task #5): band overlap hides a
        # one-sided gap — the r3 5-seed data had TPU losing on 4/5 seeds
        # (mean -1.3 pp).  Same seed = same dictionary init = paired
        # samples; report the per-seed difference, its sign pattern, and
        # whether the mean gap is inside 2 standard errors of the
        # paired noise.
        diffs = [t - o for t, o in zip(tpu_accs, orc_accs)]
        n = len(diffs)
        mean_d = float(np.mean(diffs))
        sd = float(np.std(diffs, ddof=1))
        sem = sd / np.sqrt(n)
        res["paired_diff_tpu_minus_oracle"] = diffs
        res["paired_mean_diff"] = mean_d
        res["paired_sd"] = sd
        res["paired_sem"] = sem
        res["paired_sign_pattern"] = "".join(
            "+" if d > 0 else ("-" if d < 0 else "0") for d in diffs
        )
        res["paired_mean_within_2sem"] = bool(abs(mean_d) <= 2 * sem)
        # t statistic (n-1 dof); |t| > ~2.26 at n=10 rejects "no gap"
        res["paired_t"] = float(mean_d / max(sem, 1e-12))

    from benchmarks import write_result

    print("wrote", write_result("lcksvd_seeds", res))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-oracle", action="store_true")
    main(**vars(ap.parse_args()))
