"""Committed-artifact consistency (VERDICT r2 tasks #3/#9).

The repo's claim is "measured": committed numbers that contradict newer
committed numbers are a deliverable-level bug.  These tests pin the
invariants that rotted in r2 — they read ONLY committed JSON artifacts
(no chip, no solver runs) and skip when an artifact doesn't exist yet.
"""

import json
import pathlib

import pytest

RESULTS = pathlib.Path(__file__).parent.parent / "benchmarks" / "results"


def _load(name):
    path = RESULTS / name
    if not path.exists():
        pytest.skip(f"{name} not generated yet")
    return json.loads(path.read_text())


def test_lcksvd_accuracy_inside_seed_band():
    # config-5's single-seed accuracy must sit inside the measured
    # seed-to-seed band (the "+-noise" of BASELINE's parity bar, made
    # concrete by benchmarks/lcksvd_seeds.py)
    cfg5 = _load("config5.json")
    band = _load("lcksvd_seeds.json")
    lo, hi = band.get("union_band", band["tpu_band"])
    eps = 1e-9
    assert lo - eps <= cfg5["lcksvd_accuracy"] <= hi + eps, (
        cfg5["lcksvd_accuracy"], (lo, hi))
    # and the fast path's band must overlap the oracle's (parity claim)
    if "bands_overlap" in band:
        assert band["bands_overlap"], (
            band["tpu_band"], band["oracle_band"])


def test_artifacts_carry_provenance_stamp():
    # every reader-facing artifact must be stamped (staleness
    # detectable: benchmarks/__init__.py stamp()) — extended to the
    # full config list in r4 (VERDICT r3 task #2: config1/3/4/5/6
    # were r4-r6-era captures with no stamp at all)
    stamped = [
        "solver_throughput.json", "eps_sustained.json",
        "config1.json", "config2.json", "config3.json",
        "config4.json", "config5.json", "config6.json",
        "lcksvd_seeds.json", "cpu_oracle_pinned.json",
    ]
    for name in stamped:
        res = _load(name)
        assert "git_rev" in res and "generated_utc" in res, name


def test_headline_artifacts_generated_from_clean_tree():
    # stamps that say "dirty" detect staleness but don't prevent
    # unreproducibility (VERDICT r3 weak #7): headline artifacts must
    # come from a committed tree
    headline = [
        "config1.json", "config2.json", "config3.json",
        "config4.json", "config5.json", "config6.json",
        "lcksvd_seeds.json", "cpu_oracle_pinned.json",
        # artifacts cited as a DEFAULT's justification (VERDICT r4 #5):
        # the fs cold-builder grid + duel (cold_backend), the group
        # kernel A/B + duel (fused/packed)
        "ab_fs_fused.json", "probe_fs28_duel.json",
        "group_omp_fused.json", "probe_group_duel.json",
    ]
    for name in headline:
        res = _load(name)
        assert res.get("git_dirty") is False, (
            name, res.get("git_rev"), res.get("git_dirty"))


def test_lcksvd_paired_gap_within_recorded_bound():
    # BASELINE configs[4] parity bar is "accuracy parity (exact or
    # +-noise)": with >=10 paired seeds the mean TPU-oracle gap must be
    # inside 2 standard errors of the paired noise, or the artifact
    # must explicitly record the measured deficit (documented fp32
    # cost) — either way the committed claim and data must agree.
    band = _load("lcksvd_seeds.json")
    if "paired_mean_diff" not in band:
        pytest.skip("pre-r4 artifact without paired analysis")
    mean_d = band["paired_mean_diff"]
    sem = band["paired_sem"]
    if band["paired_mean_within_2sem"]:
        assert abs(mean_d) <= 2 * sem + 1e-12
    else:
        # a real measured deficit: must be recorded and small (<2 pp)
        assert "measured_deficit_note" in band, (
            "one-sided gap beyond noise but no committed explanation")
        assert abs(mean_d) < 0.02, mean_d


def test_sweep_group_row_consistent_with_fused_artifact():
    # VERDICT r4 #1: the r4 end-of-round sweep committed a group-OMP row
    # of 176k p/s against group_omp_fused.json's 527k — a 3.7x
    # contradiction that probe_group.json root-caused as single-run
    # session variance (quiet-chip isolated reruns: median 536k, spread
    # 479-842k, solver unchanged).  The r5 sweep takes the median of 3
    # protocol runs; this pins that the committed median agrees with the
    # fused artifact inside the measured session band.
    sweep = _load("solver_throughput.json")
    if "protocol_runs" not in sweep:
        pytest.skip("pre-r5 single-protocol-run sweep artifact")
    fused = _load("group_omp_fused.json")
    row = sweep["patches_per_sec"]["group_omp(T=4,gs=4)"]
    ref = fused["packed_b256"]["pps"]
    assert 0.6 * ref <= row <= 1.7 * ref, (row, ref)
    # the raw runs must be recorded so an outlier is visible, not silent
    assert len(sweep["protocol_runs"]["group_omp(T=4,gs=4)"]) >= 3


def test_config6_rate_consistent_with_features_profile():
    # VERDICT r4 #4: config6.json's reader-facing rate must agree with
    # the profiled warm pipeline (profile_features.json) instead of
    # silently folding one-time compile or a cold single pass into
    # "images/s" (the r4 capture read 43 img/s on a 1,015 img/s
    # pipeline).
    cfg6 = _load("config6.json")
    if "block_compile_seconds" not in cfg6:
        pytest.skip("pre-r5 artifact without cold/warm split")
    prof = _load("profile_features.json")
    r = cfg6["images_per_sec"] / prof["images_per_sec"]
    assert 0.4 <= r <= 2.5, (
        cfg6["images_per_sec"], prof["images_per_sec"])


def test_config5_warm_time_inside_seed_band():
    # config5's warm LC-KSVD fit must sit near the measured warm band
    # (lcksvd_seeds.json runs after the first: 1.5-2.4 s) — the r4
    # artifact's 65.8 s headline was ~97% one-time compile.
    cfg5 = _load("config5.json")
    if "lcksvd_seconds_warm" not in cfg5:
        pytest.skip("pre-r5 artifact without cold/warm split")
    band = _load("lcksvd_seeds.json")
    warm_runs = sorted(band["tpu_seconds"][1:])   # run 0 carries compiles
    assert cfg5["lcksvd_seconds_warm"] <= 3 * warm_runs[-1], (
        cfg5["lcksvd_seconds_warm"], warm_runs)
