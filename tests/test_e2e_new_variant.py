"""End-to-end slice for the SerenadeNew (-modded) pipeline: f0_fluc dumps →
train via ssc_train_new → decode via ssc_decode_new."""

import os
import sys

import numpy as np
import pytest
import yaml

from serenade_tpu.features import FeatureConfig, extract_features
from serenade_tpu.utils.audio import read_wav, write_wav
from serenade_tpu.utils.h5 import read_hdf5, write_hdf5
from tests.test_e2e_pipeline import (
    CONTENT_DIM,
    TINY_CONFIG,
    UTTS,
    fake_content_fn,
    synth_wav,
    _run_cli,
)


@pytest.fixture(scope="module")
def workdir_new(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_new")
    wavdir = root / "wav"
    dumpdir = root / "dump"
    wavdir.mkdir()
    dumpdir.mkdir()

    cfg = dict(TINY_CONFIG)
    cfg.update(
        model_type="SerenadeNew",
        trainer_type="SSCTrainerNew",
        collater_type="SSCCollaterNew",
        dataset_type="FeatsDatasetNew",
    )
    fc = FeatureConfig.from_dict(cfg)
    for utt, freq in UTTS:
        wav_path = wavdir / f"{utt}.wav"
        synth_wav(str(wav_path), freq)
        audio, fs = read_wav(str(wav_path))
        feats = extract_features(utt, audio, fs, fc,
                                 content_fn=fake_content_fn,
                                 with_f0_fluc=True)
        assert feats is not None and "f0_fluc" in feats
        for k, v in feats.items():
            write_hdf5(str(dumpdir / f"{utt}.h5"), k, v)

    cfg_path = root / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root


def test_new_variant_train_and_decode(workdir_new):
    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_train_new import main as train_main
    from serenade_tpu.bin.ssc_decode_new import main as decode_main
    from serenade_tpu.checkpoint import find_latest_checkpoint

    root = workdir_new
    dump = str(root / "dump")
    statsdir = str(root / "stats")
    expdir = str(root / "exp")
    outdir = str(root / "decoded")
    cfg = str(root / "config.yml")

    _run_cli(stats_main, ["--rootdir", dump, "--dumpdir", statsdir,
                          "--config", cfg])
    stats = os.path.join(statsdir, "stats.joblib")
    _run_cli(train_main, [
        "--train-dumpdir", dump, "--dev-dumpdir", dump, "--stats", stats,
        "--outdir", expdir, "--config", cfg, "--data-axis", "2",
    ])
    ckpt = find_latest_checkpoint(expdir)
    assert ckpt is not None

    _run_cli(decode_main, [
        "--dumpdir", dump, "--stats", stats, "--outdir", outdir,
        "--checkpoint", ckpt, "--n-timesteps", "2",
    ])
    decoded = [f for f in os.listdir(outdir) if f.endswith(".h5")]
    assert decoded
    mel = read_hdf5(os.path.join(outdir, decoded[0]), "mel")
    assert mel is not None and np.isfinite(mel).all()


def test_new_variant_windowed_stream(workdir_new):
    """convert_wav_stream threads the f0_fluc feature (computed per
    extraction window) through the SerenadeNew chunk converter."""
    from tests.test_stream_windowed import local_content_fn

    from serenade_tpu.api import Converter
    from serenade_tpu.features import (
        FeatureConfig, _prepare_audio, stream_total_frames,
    )

    root = workdir_new
    conv = Converter(str(root / "exp"),
                     str(root / "stats" / "stats.joblib"), n_timesteps=2)
    assert conv.variant_new
    conv._content_fn = local_content_fn

    fc = FeatureConfig.from_dict(conv.config)
    h5 = sorted((root / "dump").glob("*.h5"))[0]
    ref = {k: read_hdf5(str(h5), k)
           for k in ("hubert", "logmel", "loud", "f0_fluc",
                     "est_lf0_score")}
    ref["score"] = ref.pop("est_lf0_score")

    rng = np.random.default_rng(0)
    t = np.arange(int(24000 * 2.0)) / 24000
    wav = (0.3 * np.sin(2 * np.pi * 262.0 * np.cumsum(
        np.ones_like(t)) / 24000)
           + 1e-3 * rng.normal(size=len(t))).astype(np.float32)
    n = stream_total_frames(len(_prepare_audio("s", wav, 24000, fc)), fc)

    segs = list(conv.convert_wav_stream(
        wav, 24000, ref, chunk_frames=128, overlap_frames=32,
        first_chunk_frames=64, extract_ctx_frames=64))
    assert sum(seg.shape[0] for _, seg, _ in segs) == n
    for _, seg, _ in segs:
        assert np.isfinite(seg).all()
