"""bench.py regression tracking: vs_prev diffing + direction rules."""

import json
import sys


def _bench():
    sys.path.insert(0, ".")
    import bench
    return bench


def test_direction_rules():
    bench = _bench()
    assert bench._metric_better_when_lower("ssc_conversion_rtf_1chip")
    assert bench._metric_better_when_lower("conversion_rtf_ab2_7step")
    assert bench._metric_better_when_lower("e2e_with_features_rtf")
    assert not bench._metric_better_when_lower("vocoder_samples_per_sec")
    assert not bench._metric_better_when_lower("train_mfu")
    assert not bench._metric_better_when_lower("loader_batches_per_sec")


def test_diff_vs_prev_flags_only_out_of_noise_drops(tmp_path):
    bench = _bench()
    prev = {
        "metric": "ssc_conversion_rtf_1chip",
        "value": 0.004,
        "details": {
            "vocoder_samples_per_sec": 14_000_000,
            "harvest_frames_per_sec": 39_000,
            "train_mfu": 0.42,
            "flash_vs_xla": {"T1536_ms": {"xla": 1.0}},  # dicts skipped
        },
    }
    prev_path = tmp_path / "BENCH_r09.json"
    prev_path.write_text(json.dumps(prev))

    details = {
        "vocoder_samples_per_sec": 13_000_000,   # -7%: inside 2*0.2 noise
        "harvest_frames_per_sec": 20_000,        # -49%: beyond 2*0.2
        "train_mfu": 0.45,                       # improvement: never flags
    }
    variance = {
        "vocoder_samples_per_sec": 0.20,
        "harvest_frames_per_sec": 0.20,
        "train_mfu": 0.02,
    }
    out = bench._diff_vs_prev(details, variance,
                              "ssc_conversion_rtf_1chip", 0.0039,
                              prev_path=str(prev_path))
    assert out["prev_file"] == "BENCH_r09.json"
    assert "harvest_frames_per_sec" in out["regressions"]
    assert "vocoder_samples_per_sec" not in out["regressions"]
    assert "train_mfu" not in out["regressions"]
    # headline improved (rtf down) -> delta negative, no regression
    assert out["deltas"]["ssc_conversion_rtf_1chip"] < 0
    assert "ssc_conversion_rtf_1chip" not in out["regressions"]


def test_diff_vs_prev_rtf_up_is_regression(tmp_path):
    bench = _bench()
    prev_path = tmp_path / "BENCH_r02.json"
    prev_path.write_text(json.dumps(
        {"metric": "ssc_conversion_rtf_1chip", "value": 0.0034,
         "details": {}}))
    out = bench._diff_vs_prev({}, {"ssc_conversion_rtf_1chip": 0.03},
                              "ssc_conversion_rtf_1chip", 0.006,
                              prev_path=str(prev_path))
    assert "ssc_conversion_rtf_1chip" in out["regressions"]


def test_diff_vs_prev_unwraps_driver_parsed_layout(tmp_path):
    """The driver's BENCH_r*.json nests the bench line under 'parsed'."""
    bench = _bench()
    prev_path = tmp_path / "BENCH_r03.json"
    prev_path.write_text(json.dumps({
        "n": 3, "cmd": "python bench.py", "rc": 0,
        "parsed": {"metric": "ssc_conversion_rtf_1chip", "value": 0.0034,
                   "details": {"train_mfu": 0.42}},
    }))
    out = bench._diff_vs_prev({"train_mfu": 0.43}, {},
                              "ssc_conversion_rtf_1chip", 0.0034,
                              prev_path=str(prev_path))
    assert out["deltas"]["train_mfu"] > 0
    assert not out["regressions"]


def test_diff_vs_prev_suppresses_flags_when_tunnel_degraded(tmp_path):
    """A degraded-tunnel window records deltas but flags no regressions
    (the slowdown is the shared tunnel, not code — docs/CONTENTVEC_WEDGE.md)."""
    bench = _bench()
    prev = {"metric": "ssc_conversion_rtf_1chip", "value": 0.004,
            "details": {"vocoder_samples_per_sec": 14_000_000}}
    prev_path = tmp_path / "BENCH_r09.json"
    prev_path.write_text(json.dumps(prev))

    details = {"vocoder_samples_per_sec": 2_000_000,  # -86%: way worse
               "tunnel_rtt_ms": 129_300.0, "tunnel_degraded": True}
    out = bench._diff_vs_prev(details, {}, "ssc_conversion_rtf_1chip",
                              0.04, prev_path=str(prev_path))
    assert out["regressions"] == {}
    assert "tunnel_degraded" in out["regressions_suppressed"]
    assert out["deltas"]["vocoder_samples_per_sec"] < -0.8

    # healthy tunnel: the same numbers DO flag
    details2 = {"vocoder_samples_per_sec": 2_000_000, "tunnel_rtt_ms": 2.4}
    out2 = bench._diff_vs_prev(details2, {}, "ssc_conversion_rtf_1chip",
                               0.04, prev_path=str(prev_path))
    assert set(out2["regressions"]) == {"vocoder_samples_per_sec",
                                        "ssc_conversion_rtf_1chip"}
