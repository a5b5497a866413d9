"""fp64 NumPy-oracle LC-KSVD end to end on the config-5 digits protocol.

BASELINE config 5's acceptance bar is "accuracy parity (exact or +-noise)"
with the reference pipeline.  The reference mount is empty, so the in-tree
fp64 oracle (the executable spec, SURVEY.md section 4.1) is the reference:
this script runs the IDENTICAL protocol to benchmarks/run.py::config5 —
same split (random_state=0, stratify), same unit-norm preprocessing, same
K/T/alpha/beta/n_iter — through oracle.* only, and records the fp64
accuracy next to the TPU number so the parity gap is measurable.

    python -m benchmarks.lcksvd_oracle        # ~minutes, pure CPU/NumPy
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
from sklearn.datasets import load_digits
from sklearn.model_selection import train_test_split

from lyssandra_tpu import oracle

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def run(K: int = 500, T: int = 8, n_iter: int = 20,
        alpha: float = 0.25, beta: float = 0.5, seed: int = 0,
        predict_T: int | None = None) -> dict:
    digits = load_digits()
    X = digits.data.T.astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-9)
    y = digits.target
    Xtr, Xte, ytr, yte = train_test_split(
        X.T, y, test_size=0.3, random_state=0, stratify=y
    )
    Xtr, Xte = Xtr.T, Xte.T
    C = int(y.max()) + 1
    per = K // C

    t0 = time.perf_counter()
    # per-class K-SVD init (mirrors classify/lc_ksvd.py LCKSVD.fit)
    subdicts = []
    for c in range(C):
        Kc = per if c < C - 1 else K - per * (C - 1)
        Dc, _ = oracle.ksvd(
            Xtr[:, ytr == c], Kc, min(T, Kc), n_iter=max(2, n_iter // 2),
            init="data", exact=False, seed=seed + c, replace_dead=False,
        )
        subdicts.append(Dc)
    D0 = np.concatenate(subdicts, axis=1)
    D0 /= np.maximum(np.linalg.norm(D0, axis=0, keepdims=True), 1e-12)

    G0 = oracle.batch_omp(D0, Xtr, T)
    Q = oracle.build_label_consistency(ytr, K, C)
    H = oracle.one_hot(ytr, C)
    A0 = oracle.ridge(G0, Q)
    W0 = oracle.ridge(G0, H)

    Xt, Dt = oracle.lc_ksvd_stack(Xtr, ytr, D0, A0, W0, Q, H, alpha, beta)
    for _ in range(n_iter):
        Gamma = oracle.batch_omp(Dt, Xt, T)
        Dt, Gamma = oracle.ksvd_atom_update(Xt, Dt, Gamma, exact=False)
    D, A, W = oracle.lc_ksvd_unstack(Dt, Xtr.shape[0], K, C, alpha, beta)
    fit_dt = time.perf_counter() - t0

    pT = predict_T if predict_T is not None else T
    Gte = oracle.omp(D, Xte, pT)
    acc = float((np.argmax(W @ Gte, axis=0) == np.asarray(yte)).mean())
    Gtr = oracle.omp(D, Xtr, pT)
    acc_tr = float((np.argmax(W @ Gtr, axis=0) == np.asarray(ytr)).mean())
    return {
        "task": "lcksvd fp64 oracle (config-5 protocol)",
        "K": K, "T": T, "n_iter": n_iter,
        "alpha": alpha, "beta": beta, "predict_T": pT,
        "oracle_lcksvd_accuracy": acc,
        "oracle_lcksvd_train_accuracy": acc_tr,
        "oracle_fit_seconds": fit_dt,
    }


if __name__ == "__main__":
    out = run()
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(os.path.join(RESULTS_DIR, "lcksvd_oracle.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
