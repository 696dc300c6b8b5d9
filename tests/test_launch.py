"""utils/launch.sh — run.pl-counterpart semantics: JOB substitution in args
and log paths, concurrent elements, failure propagation."""

import os
import subprocess

RECIPE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "egs", "gtsinger", "ssc1")
LAUNCH = os.path.join(RECIPE, "utils", "launch.sh")


def test_array_substitution_and_logs(tmp_path):
    log = tmp_path / "logs" / "job.JOB.log"
    res = subprocess.run(
        ["bash", LAUNCH, "--array", "1:3", str(log),
         "bash", "-c", "echo element JOB"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    for j in (1, 2, 3):
        content = (tmp_path / "logs" / f"job.{j}.log").read_text()
        assert f"element {j}" in content


def test_failure_propagates(tmp_path):
    log = tmp_path / "f.JOB.log"
    res = subprocess.run(
        ["bash", LAUNCH, "--array", "1:3", str(log),
         "bash", "-c", "test JOB -ne 2"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode != 0
    assert "element 2 failed" in res.stderr
