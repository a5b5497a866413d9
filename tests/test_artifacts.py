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
    # every artifact regenerated since r8 must be stamped (staleness
    # detectable: benchmarks/__init__.py stamp())
    stamped = [
        "solver_throughput.json", "eps_sustained.json",
    ]
    for name in stamped:
        res = _load(name)
        assert "git_rev" in res and "generated_utc" in res, name
