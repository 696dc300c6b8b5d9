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


def test_postprocessing_with_trained_orbax_checkpoint(tmp_path):
    """Stage 9 accepts a serenade-vocoder-train orbax checkpoint directly
    (the in-framework SiFiGAN training loop closes into postprocessing)."""
    import jax
    import jax.numpy as jnp

    from serenade_tpu.bin.ssc_postprocessing import main
    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.sifigan import SiFiGANGenerator

    gen = SiFiGANGenerator(
        in_channels=43, channels=32,
        upsample_scales=(5, 4, 3, 2),
        upsample_kernel_sizes=(10, 8, 6, 4),
    )
    dfs = [jnp.ones((1, 25 * int(c))) for c in np.cumprod([5, 4, 3, 2])]
    gen_params = gen.init(jax.random.key(0),
                          jnp.zeros((1, 25 * 120, 1)),
                          jnp.zeros((1, 25, 43)), dfs)
    ckdir = tmp_path / "voc_exp"
    save_checkpoint(str(ckdir), 3, {"generator": gen_params,
                                    "discriminator": {}})
    ckpt = str(ckdir / "checkpoint-3steps")
    assert os.path.isdir(ckpt)

    t = np.arange(int(0.4 * SR)) / SR
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "utt_Tenor_Breathy.wav"), wav, SR)
    n_frames = len(wav) // 120
    lf0 = np.full((n_frames, 1), 220.0, np.float32)
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
    # exercise the yin fallback flag here (the first test covers the
    # harvest default, the reference's stage-9 analyzer)
    sys.argv = ["prog", "--in-dir", str(tmp_path), "--config", str(cfg),
                "--checkpoint-path", ckpt, "--f0-backend", "yin"]
    try:
        main()
    finally:
        sys.argv = old

    out = str(tmp_path / "utt_Tenor_Breathy_sifigan.wav")
    assert os.path.exists(out)
    y, _ = read_wav(out)
    assert np.isfinite(y).all()
