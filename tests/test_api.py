"""High-level Converter API test against the e2e-trained tiny experiment."""

import numpy as np
import pytest

from serenade_tpu.utils.h5 import read_hdf5


def test_converter_api(tmp_path):
    # reuse the e2e fixtures: train a tiny model via the CLI then convert
    # through the API
    from tests.test_e2e_pipeline import (
        TINY_CONFIG, UTTS, fake_content_fn, synth_wav, _run_cli,
    )
    import yaml
    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_train import main as train_main
    from serenade_tpu.features import FeatureConfig, extract_features
    from serenade_tpu.utils.audio import read_wav
    from serenade_tpu.utils.h5 import write_hdf5

    dump = tmp_path / "dump"
    dump.mkdir()
    fc = FeatureConfig.from_dict(TINY_CONFIG)
    items = {}
    for utt, freq in UTTS[:2]:
        wav_path = tmp_path / f"{utt}.wav"
        synth_wav(str(wav_path), freq)
        audio, fs = read_wav(str(wav_path))
        feats = extract_features(utt, audio, fs, fc,
                                 content_fn=fake_content_fn)
        for k, v in feats.items():
            write_hdf5(str(dump / f"{utt}.h5"), k, v)
        feats["score"] = feats["est_lf0_score"]
        items[utt] = feats

    cfg = tmp_path / "config.yml"
    with open(cfg, "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    _run_cli(stats_main, ["--rootdir", str(dump), "--dumpdir",
                          str(tmp_path), "--config", str(cfg)])
    _run_cli(train_main, [
        "--train-dumpdir", str(dump), "--dev-dumpdir", str(dump),
        "--stats", str(tmp_path / "stats.joblib"), "--outdir",
        str(tmp_path / "exp"), "--config", str(cfg), "--data-axis", "1",
    ])

    from serenade_tpu.api import Converter

    conv = Converter(str(tmp_path / "exp"), str(tmp_path / "stats.joblib"),
                     n_timesteps=2)
    (src, _), (ref, _) = UTTS[:2]
    mel, wav, sr = conv.convert_features(items[src], items[ref])
    assert mel.shape[0] == items[src]["hubert"].shape[0]
    assert mel.shape[1] == TINY_CONFIG["num_mels"]
    assert np.isfinite(mel).all()
    assert wav is None  # no vocoder checkpoint in the tiny config

    # distilled checkpoints dump inference_n_timesteps/inference_solver into
    # their config (trainers/distill.py); the Converter must honor them as
    # defaults so serving a distilled checkpoint runs its few-step sampler
    # without extra flags.
    exp_cfg = tmp_path / "exp" / "config.yml"
    with open(exp_cfg) as f:
        dumped = yaml.safe_load(f)
    dumped["inference_n_timesteps"] = 2
    dumped["inference_solver"] = "midpoint"
    with open(exp_cfg, "w") as f:
        yaml.safe_dump(dumped, f)
    conv2 = Converter(str(tmp_path / "exp"), str(tmp_path / "stats.joblib"))
    assert conv2.n_timesteps == 2
    assert conv2.solver == "midpoint"
    mel2, _, _ = conv2.convert_features(items[src], items[ref])
    assert mel2.shape == mel.shape and np.isfinite(mel2).all()
    # explicit flags still win over the config recommendation
    conv3 = Converter(str(tmp_path / "exp"), str(tmp_path / "stats.joblib"),
                      n_timesteps=3, solver="euler")
    assert conv3.n_timesteps == 3 and conv3.solver == "euler"
