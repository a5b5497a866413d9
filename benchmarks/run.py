"""The five BASELINE.json experiment configs, runnable end to end.

    python -m benchmarks.run --config 1 [--quick] [--oracle]

Each config measures the TPU implementation (wall-clock + quality metric)
and, with --oracle, the in-tree NumPy reference on the same (downscaled
when --quick) problem, emitting a JSON result to benchmarks/results/.

Configs (BASELINE.json `configs`):
  1. OMP coding of 10k 8x8 gray patches, fixed DCT K=256, T=5
  2. K-SVD: 50k 8x8 patches, K=512, 20 iterations, Batch-OMP coding
  3. Denoising (barbara/lena, sigma=25): PSNR parity check
  4. Feature-sign lasso + online DL, 100k color patches, K=1024
  5. LC-KSVD / SRC classification on a small digit set
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def _sync(x):
    import jax.numpy as jnp

    leaves = [t for t in __import__("jax").tree.leaves(x)
              if hasattr(t, "dtype")]
    return float(np.asarray(sum(jnp.sum(jnp.abs(t)) for t in leaves)))


def _images(quick):
    from lyssandra_tpu.utils import standard_test_image

    size = 128 if quick else 512
    return {
        "barbara": standard_test_image("barbara", size),
        "lena": standard_test_image("lena", size),
    }


def config1(quick=False, run_oracle=False):
    """OMP coding, 10k patches, DCT K=256, T=5."""
    import jax.numpy as jnp

    from lyssandra_tpu import dct_dictionary, oracle
    from lyssandra_tpu.solvers import omp
    from lyssandra_tpu.utils import patch_dataset

    n = 2000 if quick else 10000
    X = patch_dataset(list(_images(quick).values()), p=8, n_patches=n)
    D = dct_dictionary(8, 256)
    Xj = jnp.asarray(X, jnp.float32)

    _sync(omp(D, Xj, 5))  # compile + first-fetch warm-up
    # steady-state throughput: the whole 10k-patch problem is ONE device
    # program; launches are dispatched back-to-back (async) and synced once,
    # so the per-launch tunnel latency is amortized as in production use
    reps = 2 if quick else 10
    t0 = time.perf_counter()
    Gamma = None
    for _ in range(reps):
        Gamma = omp(D, Xj, 5)
    _sync(Gamma)
    dt = time.perf_counter() - t0
    G = np.asarray(Gamma, np.float64)
    rel_err = float(
        np.linalg.norm(X - np.asarray(D, np.float64) @ G)
        / np.linalg.norm(X)
    )
    out = {
        "config": 1, "n_patches": n, "launches": reps,
        "tpu_seconds": dt,
        "tpu_patches_per_sec": reps * n / dt,
        "rel_reconstruction_err": rel_err,
    }
    if run_oracle:
        no = n                       # FULL-N oracle parity (VERDICT r1 #8)
        t0 = time.perf_counter()
        Go = oracle.omp(np.asarray(D, np.float64), X[:, :no], 5)
        oracle_dt = time.perf_counter() - t0
        out["oracle_patches_per_sec"] = no / oracle_dt
        out["speedup"] = out["tpu_patches_per_sec"] * oracle_dt / no
        out["max_code_diff"] = float(np.abs(G[:, :no] - Go).max())
    return out


def config2(quick=False, run_oracle=False):
    """K-SVD dictionary learning with Batch-OMP coding."""
    from lyssandra_tpu import KSVDConfig, KSVDLearner
    from lyssandra_tpu.utils import patch_dataset

    n, K, iters = (5000, 128, 5) if quick else (50000, 512, 20)
    X = patch_dataset(list(_images(quick).values()), p=8,
                      n_patches=n).astype(np.float32)
    # warm-up: one fit iteration compiles every executable in the loop
    # (206 s cold on the remote compile helper vs 0.45 s warm — measured;
    # timing it would report compiler speed, not the framework)
    KSVDLearner(KSVDConfig(K=K, T=8, n_iter=1)).fit(X)
    t0 = time.perf_counter()
    learner = KSVDLearner(KSVDConfig(K=K, T=8, n_iter=iters)).fit(X)
    dt = time.perf_counter() - t0
    return {
        "config": 2, "n_patches": n, "K": K, "iters": iters,
        "tpu_seconds_warm": dt,
        "patches_per_iter_sec": n * iters / dt,
        "final_rmse": learner.history_[-1]["rmse"],
        "objective_trace": [h["objective"] for h in learner.history_],
        # post-coding objective (r8): the atom sweep is exactly monotone
        # (objective <= objective_coding per iteration); the CODING step
        # is greedy OMP and carries no guarantee — cross-iteration
        # upticks near convergence live there (NOTES_r8.md)
        "objective_coding_trace": [
            h.get("objective_coding") for h in learner.history_
        ],
        "seconds_per_iter": [round(h["seconds"], 3)
                             for h in learner.history_],
    }


def config3(quick=False, run_oracle=False):
    """Denoising PSNR parity (barbara/lena, sigma=25).

    Two dictionaries per image (BASELINE configs[2] "Batch-OMP + learned
    dictionary"): the fixed overcomplete DCT, and a K-SVD dictionary
    trained on the NOISY image's own patches with the same
    error-constrained coder (Elad & Aharon 2006 SS V — the adaptive
    pipeline).  Timings are warm: the first denoise call per image shape
    compiles; a warm-up pass runs outside the timed region.
    """
    from lyssandra_tpu import (
        DenoiseConfig, KSVDConfig, KSVDLearner, SparseEncoder,
        dct_dictionary, denoise, oracle,
    )
    from lyssandra_tpu.utils import patch_dataset

    import math

    from lyssandra_tpu.ops.dictionaries import dct_dictionary_color
    from lyssandra_tpu.utils import standard_test_image

    sigma = 25.0
    D_dct = dct_dictionary(8, 256)
    cfg = DenoiseConfig(sigma=sigma, T_max=16, block=16384)
    n_train, ksvd_iters = (5000, 5) if quick else (30000, 12)
    out = {"config": 3, "sigma": sigma, "images": {}}
    rng = np.random.default_rng(7)
    images = dict(_images(quick))
    # first-class COLOR route (r4): RGB image -> 3p^2-dim channel-stacked
    # patches, adaptive color K-SVD + channel-replicated-DCT baseline
    images["barbara_color"] = standard_test_image(
        "barbara", 128 if quick else 512, color=True
    )
    for name, img in images.items():
        noisy = img + sigma * rng.standard_normal(img.shape)
        noisy32 = noisy.astype(np.float32)
        rec = {"psnr_noisy": oracle.psnr(noisy, img)}
        dim = 64 * (img.shape[2] if img.ndim == 3 else 1)
        eps = cfg.gain * math.sqrt(dim) * sigma

        # adaptive dictionary: K-SVD on the noisy image's own patches,
        # error-constrained coding (the denoising coder) during training
        train = patch_dataset([noisy], p=8, n_patches=n_train,
                              seed=3).astype(np.float32)
        enc = SparseEncoder("bomp", {"T": cfg.T_max, "eps": eps},
                            check_atoms=False)
        kcfg = KSVDConfig(K=256, T=cfg.T_max, n_iter=ksvd_iters,
                          init="dct")
        # cold/warm split (VERDICT r2 task #6): the r1-r2 artifacts
        # lumped first-shape remote compiles (30-120 s EACH) into the
        # first image's train bucket — barbara read 379 s vs lena 1.7 s
        # for the same pipeline.  A 1-iteration warm-up fit compiles
        # every executable in the loop; its wall time is reported
        # separately as the compile cost.
        t0 = time.perf_counter()
        KSVDLearner(KSVDConfig(K=256, T=cfg.T_max, n_iter=1,
                               init="dct"), encoder=enc).fit(train)
        rec["ksvd_compile_plus_1iter_seconds"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        learner = KSVDLearner(kcfg, encoder=enc).fit(train)
        rec["ksvd_train_seconds"] = time.perf_counter() - t0
        D_ksvd = learner.D_

        D_fixed = dct_dictionary_color(8, 256) if img.ndim == 3 else D_dct
        for dname, D in (("dct", D_fixed), ("ksvd", D_ksvd)):
            den = denoise(noisy32, D, sigma, cfg=cfg)   # warm-up/compile
            _sync(den)
            t0 = time.perf_counter()
            den = denoise(noisy32, D, sigma, cfg=cfg)
            _sync(den)
            dt = time.perf_counter() - t0
            r = {
                "psnr_tpu": oracle.psnr(np.asarray(den, np.float64), img),
                "tpu_seconds_warm": dt,
            }
            if run_oracle:
                t0 = time.perf_counter()
                ref = oracle.denoise(noisy, np.asarray(D, np.float64),
                                     sigma, T_max=16)
                r["oracle_seconds"] = time.perf_counter() - t0
                r["psnr_oracle"] = oracle.psnr(ref, img)
                r["psnr_gap"] = abs(r["psnr_tpu"] - r["psnr_oracle"])
            rec[dname] = r
        rec["ksvd_minus_dct_db"] = (
            rec["ksvd"]["psnr_tpu"] - rec["dct"]["psnr_tpu"]
        )
        out["images"][name] = rec
    return out


def config4(quick=False, run_oracle=False):
    """Feature-sign lasso coding + online dictionary learning (color)."""
    from lyssandra_tpu import OnlineDLConfig, oracle
    from lyssandra_tpu.dict_learning import OnlineDictionaryLearner
    from lyssandra_tpu.utils import patch_dataset, synthetic_color_image

    n, K, bs = (10000, 256, 2048) if quick else (100000, 1024, 4096)
    n_hold = 2048
    # real RGB patches: (H, W, 3) images -> 3*p^2-dim channel-stacked
    # columns through the first-class color patch pipeline (r4; the r1-r3
    # phase-shifted stand-in is gone — VERDICT r1 missing #1)
    imgs = [synthetic_color_image(k, 256, seed=s)
            for s, k in enumerate(("texture", "mix", "smooth", "edges"))]
    X = patch_dataset(imgs, p=8, n_patches=n + n_hold,
                      seed=1).astype(np.float32)          # (192, n+n_hold)
    # unit-norm patches + lam ~ 0.15, the Mairal et al. operating regime —
    # lasso on raw-scale patches (|x| ~ 1e3 vs lam) is effectively lam -> 0
    # and degenerates into a dense least-squares problem
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-8)
    X, Xhold = X[:, :n], X[:, n:]
    learner = OnlineDictionaryLearner(
        OnlineDLConfig(K=K, lam=0.15, batch_size=bs)
    )
    # warm-up: compile the chunk executable outside the timed region
    learner.fit(X[:, : bs * learner.cfg.chunk_batches], holdout=Xhold)
    learner.state = None
    learner.history_ = []
    t0 = time.perf_counter()
    learner.fit(X, n_epochs=1, holdout=Xhold)
    dt = time.perf_counter() - t0
    n_coded = (n // bs) * bs
    out = {
        "config": 4, "n_patches": n, "K": K, "dim": X.shape[0],
        "batch_size": bs, "tpu_seconds": dt,
        "tpu_patches_per_sec": n_coded / dt,
        "holdout_objective_trace": [
            h["holdout_objective"] for h in learner.history_
        ],
        "avg_nnz_last": learner.history_[-1]["avg_nnz"],
        "chunk_seconds": [
            round(h["seconds"], 2) for h in learner.history_
        ],
        "timing_note": (
            "end-to-end = chunked epoch scans (whose in-scan coder is "
            "the traceable while_loop feature_sign_scan — the faster "
            "dispatch-level coder's fused Pallas cold start and "
            "segmented host continuation cannot run inside lax.scan, "
            "and each of its tricks measured an in-scan LOSS: "
            "ab_online_unroll.json, config.py fs_warm_start note) plus "
            "per-chunk holdout FISTA objectives; component "
            "decomposition in profile_config4.json"),
    }
    if run_oracle:
        # oracle rate: per-signal fp64 feature-sign (the coding hot loop;
        # the dictionary update is negligible next to it at this size)
        no = 50
        D0 = np.asarray(learner.state.D, np.float64)
        t0 = time.perf_counter()
        for i in range(no):
            oracle.feature_sign(D0, X[:, i].astype(np.float64), 0.15)
        oracle_dt = time.perf_counter() - t0
        out["oracle_signals_per_sec"] = no / oracle_dt
        out["speedup"] = out["tpu_patches_per_sec"] / (no / oracle_dt)
    return out


def config5(quick=False, run_oracle=False):
    """LC-KSVD / SRC on the sklearn digits set (bundled, offline)."""
    from sklearn.datasets import load_digits
    from sklearn.model_selection import train_test_split

    from lyssandra_tpu import LCKSVD, LCKSVDConfig
    from lyssandra_tpu.classify import SRCClassifier

    digits = load_digits()
    X = digits.data.T.astype(np.float32)          # (64, 1797)
    X /= np.maximum(np.linalg.norm(X, axis=0, keepdims=True), 1e-9)
    y = digits.target
    Xtr, Xte, ytr, yte = train_test_split(
        X.T, y, test_size=0.3, random_state=0, stratify=y
    )
    Xtr, Xte = Xtr.T, Xte.T

    # warm the device->host fetch path: the FIRST fetch of a process
    # stalls for minutes on the tunneled backend (CLAUDE.md) and must
    # not land inside the timed fit
    import jax.numpy as jnp

    _sync(jnp.zeros(()))

    cfg = LCKSVDConfig(K=200 if quick else 500, T=8,
                       n_iter=4 if quick else 20)
    t0 = time.perf_counter()
    lc = LCKSVD(cfg).fit(Xtr, ytr)
    lc_cold_dt = time.perf_counter() - t0
    lc_acc = lc.score(Xte, yte)
    # cold/warm split (VERDICT r4 #4, same fix config-3 got): ~97% of the
    # first fit is one-time remote compile (lcksvd_seeds.json warm band
    # 1.5-2.4 s vs ~66 s first-call) — refit the identical shape so the
    # reader-facing time measures the framework, not the compiler.  The
    # refit is deterministic-identical (same seed path), so accuracy is
    # scored once above.
    t0 = time.perf_counter()
    lc_w = LCKSVD(cfg).fit(Xtr, ytr)
    lc_dt = time.perf_counter() - t0

    src = SRCClassifier(T=10).fit(Xtr, ytr)
    src_acc = src.score(Xte, yte)          # first call: compiles
    t0 = time.perf_counter()
    src_acc_w = SRCClassifier(T=10).fit(Xtr, ytr).score(Xte, yte)
    src_dt = time.perf_counter() - t0
    assert src_acc_w == src_acc
    out = {
        "config": 5, "n_train": Xtr.shape[1], "n_test": Xte.shape[1],
        "lcksvd_accuracy": lc_acc,
        "lcksvd_seconds_warm": lc_dt,
        "lcksvd_seconds_first_call_with_compiles": lc_cold_dt,
        "lcksvd_seconds": lc_dt,
        "lcksvd_phase_seconds_warm": getattr(lc_w, "timings_", {}),
        "lcksvd_phase_seconds_first_call": getattr(lc, "timings_", {}),
        "src_accuracy": src_acc, "src_seconds": src_dt,
        "timing_note": ("lcksvd_seconds/src_seconds are WARM same-shape "
                        "refits; *_first_call* fields carry the one-time "
                        "remote-compile cost (30-120 s per executable on "
                        "this box, CLAUDE.md)"),
    }
    if run_oracle:
        # BASELINE configs[4] bar is accuracy PARITY with the reference:
        # run the fp64 paper-faithful oracle on the identical protocol
        # (measured r3: oracle 95.0% == TPU 95.0%, exact parity; the
        # oracle's TRAIN accuracy is 95.9%, so ~95% is what LC-KSVD
        # itself achieves here — not an implementation gap)
        from benchmarks.lcksvd_oracle import run as oracle_run

        orc = oracle_run(K=500 if not quick else 200, T=8,
                         n_iter=4 if quick else 20)
        out["oracle_lcksvd_accuracy"] = orc["oracle_lcksvd_accuracy"]
        out["lcksvd_parity_gap"] = abs(
            lc_acc - orc["oracle_lcksvd_accuracy"]
        )
    return out


def config6(quick=False, run_oracle=False):
    """Recognition through the feature-extraction pipeline (SURVEY.md §3.5):
    dense patches -> DC + contrast norm + ZCA whitening -> Batch-OMP codes
    over a K-SVD dictionary -> spatial-pyramid max pooling -> linear
    classifier.  Dataset: synthetic texture classes (zero-egress stand-in
    for the reference's image-recognition experiments); exercises the
    whitened preprocessing stack end to end."""
    import jax.numpy as jnp

    from lyssandra_tpu import KSVDConfig, KSVDLearner
    from lyssandra_tpu.apps import FeatureExtractor
    from lyssandra_tpu.classify import LinearClassifier
    from lyssandra_tpu.ops.patches import contrast_normalize, remove_dc
    from lyssandra_tpu.ops.whitening import Whitener
    from lyssandra_tpu.utils import patch_dataset, synthetic_image

    C, size = 4, 64
    n_tr, n_te = (20, 10) if quick else (60, 30)
    kinds = ["smooth", "texture", "edges", "mix"]
    rng = np.random.default_rng(11)

    def make(cls, n, seed0):
        return [
            synthetic_image(kinds[cls], size, seed=seed0 + 7 * i)
            + 4.0 * rng.standard_normal((size, size))
            for i in range(n)
        ]

    train = [(im, c) for c in range(C) for im in make(c, n_tr, 1000 + c)]
    test = [(im, c) for c in range(C) for im in make(c, n_te, 9000 + c)]
    ytr = np.array([c for _, c in train])
    yte = np.array([c for _, c in test])

    # whitener + dictionary from training patches only
    Xp = patch_dataset([im for im, _ in train], p=8, n_patches=20000,
                       seed=2).astype(np.float32)
    Xp, _ = remove_dc(jnp.asarray(Xp))
    Xp, _ = contrast_normalize(Xp)
    wh = Whitener().fit(Xp)
    Xw = wh.transform(Xp)
    learner = KSVDLearner(
        KSVDConfig(K=256, T=6, n_iter=4 if quick else 8, init="data")
    ).fit(Xw)

    fe = FeatureExtractor(
        learner.D_, patch=8, stride=4, levels=(1, 2),
        preprocess="dc+norm+whiten", whitener=wh,
    )
    imgs_tr = np.stack([im for im, _ in train]).astype(np.float32)
    imgs_te = np.stack([im for im, _ in test]).astype(np.float32)
    # compile outside timing — a FULL img_block so the timed loop reuses
    # the same executable (the old 4-image warm-up compiled a shape the
    # timed run never used; with partial-block padding there is exactly
    # ONE block shape now — profile_features.json r4)
    t0 = time.perf_counter()
    _sync(fe.transform(imgs_tr[: fe.img_block]))
    block_compile_s = time.perf_counter() - t0
    # cold/warm split (VERDICT r4 #4): the block compile above is a
    # one-time cost, not throughput — profile_features.json measures the
    # same warm pipeline at ~1,000 img/s and test_artifacts pins this
    # rate against it.  Best of 2 passes: a single pass right after
    # other chip jobs has read up to 23x low (the r4 43.1 img/s capture).
    dt = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        Ftr = fe.transform(imgs_tr)
        Fte = fe.transform(imgs_te)
        _sync((Ftr, Fte))
        dt = min(dt, time.perf_counter() - t0)
    clf = LinearClassifier(lam=1e-2).fit(np.asarray(Ftr).T, ytr)
    acc = clf.score(np.asarray(Fte).T, yte)
    n_imgs = len(train) + len(test)
    return {
        "config": 6, "task": "feature-extraction recognition",
        "classes": C, "n_train": len(train), "n_test": len(test),
        "accuracy": acc,
        "feature_dim": int(Ftr.shape[1]),
        "block_compile_seconds": block_compile_s,
        "extract_seconds_warm": dt,
        "extract_seconds": dt,
        "images_per_sec": n_imgs / dt,
        "timing_note": ("extract_seconds is the best warm pass "
                        "(block executable compiled once above, "
                        "block_compile_seconds)"),
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, required=True, choices=CONFIGS)
    ap.add_argument("--quick", action="store_true",
                    help="downscaled problem sizes")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the NumPy oracle for parity/speedup")
    args = ap.parse_args()

    result = CONFIGS[args.config](quick=args.quick, run_oracle=args.oracle)
    from benchmarks import stamp
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"config{args.config}.json")
    with open(path, "w") as f:
        json.dump(stamp(result), f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
