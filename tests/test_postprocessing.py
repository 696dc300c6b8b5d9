"""Smoke test for the SiFiGAN post-processing CLI (random weights path)."""

import os
import sys

import numpy as np
import yaml

from serenade_tpu.utils.audio import read_wav, write_wav
from serenade_tpu.utils.h5 import write_hdf5

SR = 24000


def test_postprocessing_cli(tmp_path):
    from serenade_tpu.bin.ssc_postprocessing import main

    # a fake converted utterance (Tenor range) + its decode-written lf0
    t = np.arange(int(0.4 * SR)) / SR
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_path = tmp_path / "utt_Tenor_Breathy.wav"
    write_wav(str(wav_path), wav, SR)
    n_frames = len(wav) // 120  # 5 ms hop
    lf0 = np.full((n_frames, 1), 220.0, np.float32)
    lf0[:5] = 0.0
    write_hdf5(str(tmp_path / "utt_Tenor_Breathy.h5"), "lf0", lf0)

    cfg = tmp_path / "post.yml"
    with open(cfg, "w") as f:
        yaml.safe_dump(dict(
            sample_rate=SR,
            generator=dict(
                in_channels=43, channels=32,
                upsample_scales=[5, 4, 3, 2],
                upsample_kernel_sizes=[10, 8, 6, 4],
            ),
        ), f)

    old = sys.argv
    sys.argv = ["prog", "--in-dir", str(tmp_path), "--config", str(cfg)]
    try:
        main()
    finally:
        sys.argv = old

    out = str(tmp_path / "utt_Tenor_Breathy_sifigan.wav")
    assert os.path.exists(out)
    y, sr = read_wav(out)
    assert sr == SR
    # analysis frame count is len//hop + 1; allow that off-by-one frame
    assert abs(len(y) - n_frames * 120) <= 240
    assert np.isfinite(y).all()
