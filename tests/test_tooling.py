"""Recipe/ops tooling: splitjson shard integrity, param-count CLI.

Counterparts of the reference's utils/splitjson.py and the sifigan
param_count.yaml surface (/root/reference/serenade/bin/sifigan_config/
param_count.yaml) — previously recorded as dead tooling, now closed.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLITJSON = os.path.join(REPO, "egs/gtsinger/ssc1/utils/splitjson.py")


def test_splitjson_partition(tmp_path):
    src = tmp_path / "data.json"
    utts = {f"utt{i:03d}": {"frames": i * 7} for i in range(11)}
    src.write_text(json.dumps({"utts": utts}))

    subprocess.run([sys.executable, SPLITJSON, str(src), "--parts", "4"],
                   check=True, capture_output=True)

    outdir = tmp_path / "split4utt"
    seen = {}
    for i in range(1, 5):
        part = json.loads((outdir / f"data.{i}.json").read_text())
        for k, v in part["utts"].items():
            assert k not in seen, f"duplicate key {k}"
            seen[k] = v
    assert seen == utts  # exact partition: nothing lost, nothing changed


def test_splitjson_rejects_bad_parts(tmp_path):
    src = tmp_path / "d.json"
    src.write_text(json.dumps({"utts": {"a": {}}}))
    r = subprocess.run([sys.executable, SPLITJSON, str(src), "-p", "5"],
                       capture_output=True)
    assert r.returncode != 0


def test_param_count_config_mode(tmp_path):
    cfg = tmp_path / "config.yml"
    cfg.write_text(
        "model_type: Serenade\n"
        "model_params:\n"
        "  input_dim: 768\n"
        "  output_dim: 80\n"
        "  encoder_channels: 80\n"
        "  decoder_channels: 32\n"
        "  gst_embed_dim: 32\n"
        "  decoder_attention_head_dim: 32\n"
    )
    r = subprocess.run(
        [sys.executable, "-m", "serenade_tpu.bin.param_count",
         "--config", str(cfg), "--json"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert out["total"] > 0
    assert any("cfm_decoder" in k for k in out["per_module"])
    assert out["size_mb"]["float32"] > out["size_mb"]["int8"]
