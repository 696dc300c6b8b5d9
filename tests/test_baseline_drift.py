"""BASELINE.md <-> BENCH drift guard (VERDICT r4 item 7).

BASELINE.md's measured tables and the driver-recorded BENCH_r*.json
drifted twice across rounds (r3: headline tables labeled round 2; r4:
the loader row quoting superseded numbers).  The quoted-as-current
numbers now live in BASELINE_SYNC.json next to the prose; this test
fails when they diverge from the LATEST BENCH_r*.json beyond the noise
band, forcing BASELINE.md and the sync file to be updated together.

Metrics the latest bench flags as measured under host contention
(``host_side_metrics_invalid``) are skipped — a contended loader number
is not evidence of drift.
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_bench():
    files = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
                   key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
    if not files:
        pytest.skip("no BENCH_r*.json recorded yet")
    with open(files[-1]) as f:
        bench = json.load(f)
    return os.path.basename(files[-1]), bench.get("parsed", bench)


def test_baseline_sync_tracks_latest_bench():
    with open(os.path.join(ROOT, "BASELINE_SYNC.json")) as f:
        sync = json.load(f)
    name, bench = _latest_bench()
    details = bench.get("details") or {}
    flat = {bench.get("metric", "headline"): bench.get("value")}
    flat.update({k: v for k, v in details.items()
                 if isinstance(v, (int, float))})
    variance = details.get("variance") or {}
    invalid = set(details.get("host_side_metrics_invalid") or [])

    drifted = {}
    for key, quoted in sync.items():
        if key.startswith("_") or key in invalid:
            continue
        now = flat.get(key)
        if now is None:  # metric dropped from the bench: also drift
            drifted[key] = {"quoted": quoted, "bench": "MISSING"}
            continue
        band = max(2.0 * float(variance.get(key, 0.15)), 0.10)
        rel = abs(now - quoted) / max(abs(quoted), 1e-12)
        if rel > band:
            drifted[key] = {"quoted": quoted, "bench": now,
                            "rel": round(rel, 3), "band": round(band, 3)}
    assert not drifted, (
        f"BASELINE.md quotes numbers that drifted from {name}: "
        f"{json.dumps(drifted, indent=2)} - re-sync BASELINE.md and "
        "BASELINE_SYNC.json")
