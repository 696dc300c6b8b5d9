"""AOT export/deploy: StableHLO artifact round trip vs the live Converter."""

import os

import numpy as np
import pytest
import yaml


def _tiny_experiment(tmp_path):
    """Train the tiny e2e experiment and return (expdir, stats, items)."""
    from tests.test_e2e_pipeline import (
        TINY_CONFIG, UTTS, fake_content_fn, synth_wav, _run_cli,
    )
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
    return str(tmp_path / "exp"), str(tmp_path / "stats.joblib"), items


def test_export_roundtrip_matches_converter(tmp_path):
    from tests.test_e2e_pipeline import UTTS
    from serenade_tpu.api import Converter
    from serenade_tpu.deploy import ExportedConverter, export_converter, load

    expdir, stats, items = _tiny_experiment(tmp_path)
    (src, _), (ref, _) = UTTS[:2]
    t_src = items[src]["hubert"].shape[0]
    t_ref = items[ref]["hubert"].shape[0]

    from serenade_tpu.collaters.ssc import bucket_length

    conv = Converter(expdir, stats, n_timesteps=2, seed=7)
    art = str(tmp_path / "export")
    # first bucket matches the live Converter's packing (bucket_length), so
    # the two paths draw the SAME padded shapes -> the same CFM noise
    ts = bucket_length(t_src)
    tr = bucket_length(t_ref)
    manifest = export_converter(conv, art, buckets=((ts, tr), (512, 256)))

    assert os.path.exists(os.path.join(art, "manifest.json"))
    assert len(manifest["files"]) == 2
    for fname in manifest["files"].values():
        assert os.path.getsize(os.path.join(art, fname)) > 1000
    assert manifest["has_vocoder"] is False
    assert "cpu" in manifest["platforms"]

    # the artifact runs standalone and matches the live Converter: same
    # seed => the key chains split identically, normalization is baked into
    # the program, and the matching bucket gives identical padded shapes;
    # residual difference is AOT-vs-JIT compilation of the same program
    exp = load(art, seed=7)
    assert isinstance(exp, ExportedConverter)
    mel_live, wav, sr = conv.convert_features(items[src], items[ref])
    mel_exp, wav_e, sr_e = exp.convert_features(items[src], items[ref])
    assert wav is None and wav_e is None and sr_e is None
    assert mel_exp.shape == (t_src, mel_live.shape[1]) == mel_live.shape
    assert np.isfinite(mel_exp).all()
    np.testing.assert_allclose(mel_exp, mel_live, atol=1e-4, rtol=1e-4)

    # the PRNG chain advances per call: a second conversion differs
    mel_exp2, _, _ = exp.convert_features(items[src], items[ref])
    assert np.abs(mel_exp2 - mel_exp).max() > 1e-6

    # a larger bucket samples DIFFERENT noise but the same flow: outputs
    # correlate strongly without being equal (padding-invariant
    # conditioning, fresh z draw over the longer packed sequence)
    exp_big = load(art, seed=7)
    exp_big.manifest["buckets"] = [[512, 256]]  # force the big bucket
    mel_big, _, _ = exp_big.convert_features(items[src], items[ref])
    corr = np.corrcoef(mel_big.ravel(), mel_live.ravel())[0, 1]
    assert corr > 0.99, f"corr {corr:.4f}"

    # bucket selection: too-long sources fail loudly
    big = {k: np.repeat(np.asarray(v), 8, axis=0)
           for k, v in items[src].items()}
    with pytest.raises(ValueError, match="no exported bucket"):
        exp.convert_features(big, items[ref])


def test_export_cli(tmp_path):
    from tests.test_e2e_pipeline import UTTS, _run_cli
    from serenade_tpu.bin.export import main as export_main
    from serenade_tpu.deploy import load

    expdir, stats, items = _tiny_experiment(tmp_path)
    art = str(tmp_path / "artifact")
    _run_cli(export_main, [
        "--expdir", expdir, "--stats", stats, "--out-dir", art,
        "--buckets", "256x256", "--n-timesteps", "2", "--solver", "ab2",
    ])
    exp = load(art)
    assert exp.manifest["solver"] == "ab2"
    (src, _), (ref, _) = UTTS[:2]
    mel, wav, sr = exp.convert_features(items[src], items[ref])
    assert np.isfinite(mel).all() and mel.shape[0] == items[src]["hubert"].shape[0]
