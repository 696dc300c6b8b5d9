"""Cyclic fine-tuning loop end to end (reference run.sh stages 5-7):
train → decode the TRAIN set → inject cyclic_logmel (conditioning from the
converted utterance, target from the original) → fine-tune from the
stage-3 checkpoint with `logmel_type: cyclic_logmel`."""

import os
import subprocess
import sys

import numpy as np
import yaml

from serenade_tpu.utils.h5 import read_hdf5, write_hdf5

RECIPE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "egs", "gtsinger", "ssc1")


def test_cyclic_finetune_e2e(tmp_path):
    from tests.test_e2e_pipeline import (
        TINY_CONFIG, UTTS, fake_content_fn, synth_wav, _run_cli,
    )
    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_decode import main as decode_main
    from serenade_tpu.bin.ssc_train import main as train_main
    from serenade_tpu.checkpoint import find_latest_checkpoint
    from serenade_tpu.features import FeatureConfig, extract_features
    from serenade_tpu.utils.audio import read_wav

    dump = tmp_path / "dump"
    dump.mkdir()
    fc = FeatureConfig.from_dict(TINY_CONFIG)
    for utt, freq in UTTS[:2]:
        wav_path = tmp_path / f"{utt}.wav"
        synth_wav(str(wav_path), freq)
        audio, fs = read_wav(str(wav_path))
        feats = extract_features(utt, audio, fs, fc,
                                 content_fn=fake_content_fn)
        for k, v in feats.items():
            write_hdf5(str(dump / f"{utt}.h5"), k, v)

    cfg_path = tmp_path / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    _run_cli(stats_main, ["--rootdir", str(dump), "--dumpdir",
                          str(tmp_path), "--config", str(cfg_path)])

    # stage 3: initial training
    _run_cli(train_main, [
        "--train-dumpdir", str(dump), "--dev-dumpdir", str(dump),
        "--stats", str(tmp_path / "stats.joblib"), "--outdir",
        str(tmp_path / "exp"), "--config", str(cfg_path), "--data-axis", "1",
    ])
    ckpt = find_latest_checkpoint(str(tmp_path / "exp"))
    assert ckpt

    # stage 5: decode the TRAIN set (mel-only; no vocoder in tiny config)
    decoded = tmp_path / "decoded"
    (a, _), (b, _) = UTTS[:2]
    ref_dict = tmp_path / "refstyles.json"
    ref_dict.write_text(
        '{"Falsetto": "%s"}' % (dump / f"{b}.h5"))
    _run_cli(decode_main, [
        "--dumpdir", str(dump), "--stats", str(tmp_path / "stats.joblib"),
        "--outdir", str(decoded), "--checkpoint", ckpt,
        "--ref-dict", str(ref_dict), "--n-timesteps", "2",
    ])
    conv_h5s = [f for f in os.listdir(decoded) if f.endswith(".h5")]
    assert conv_h5s, "stage-5 decode produced no converted dumps"

    # stage 6: build the cyclic dump — converted utterances' features with
    # the ORIGINAL source logmel injected as cyclic_logmel
    cyc = tmp_path / "dump_cyclic"
    cyc.mkdir()
    for f in conv_h5s:
        src_utt = f[: f.rfind("_")]  # strip _<style>.h5
        src_h5 = dump / f"{src_utt}.h5"
        if not src_h5.exists():
            continue
        # converted audio would be re-extracted in the real recipe; the
        # conditioning contract only needs the same keys + cyclic_logmel
        for k in ("wave", "hubert", "logmel", "loud", "gt_lf0_score",
                  "est_lf0_score", "f0", "vuv", "midi"):
            v = read_hdf5(str(src_h5), k)
            write_hdf5(str(cyc / f), k, v)
    res = subprocess.run(
        [sys.executable,
         os.path.join(RECIPE, "local", "create_cyclic_dump.py"),
         "--src-dumpdir", str(dump), "--cyclic-dumpdir", str(cyc)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    assert read_hdf5(str(cyc / conv_h5s[0]), "cyclic_logmel") is not None

    # stage 7: cyclic fine-tune from the stage-3 checkpoint
    cyc_cfg = dict(TINY_CONFIG)
    cyc_cfg["logmel_type"] = "cyclic_logmel"
    cyc_cfg["train_max_steps"] = TINY_CONFIG["train_max_steps"] + 2
    cyc_cfg_path = tmp_path / "config_cyclic.yml"
    with open(cyc_cfg_path, "w") as f:
        yaml.safe_dump(cyc_cfg, f)
    _run_cli(train_main, [
        "--train-dumpdir", str(cyc), "--dev-dumpdir", str(cyc),
        "--stats", str(tmp_path / "stats.joblib"), "--outdir",
        str(tmp_path / "exp_cyclic"), "--config", str(cyc_cfg_path),
        "--init-checkpoint", ckpt, "--data-axis", "1",
    ])
    cyc_ckpt = find_latest_checkpoint(str(tmp_path / "exp_cyclic"))
    assert cyc_ckpt, "cyclic fine-tune saved no checkpoint"

    # fine-tuned model still converts
    from serenade_tpu.api import Converter

    conv = Converter(str(tmp_path / "exp_cyclic"),
                     str(tmp_path / "stats.joblib"), n_timesteps=2)
    src_feats = {k: read_hdf5(str(dump / f"{a}.h5"), k)
                 for k in ("hubert", "loud")}
    src_feats["score"] = read_hdf5(str(dump / f"{a}.h5"), "est_lf0_score")
    ref_feats = {k: read_hdf5(str(dump / f"{b}.h5"), k)
                 for k in ("hubert", "loud", "logmel")}
    ref_feats["score"] = read_hdf5(str(dump / f"{b}.h5"), "est_lf0_score")
    mel, _, _ = conv.convert_features(src_feats, ref_feats)
    assert np.isfinite(mel).all()
