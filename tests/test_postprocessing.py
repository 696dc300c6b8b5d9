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

    # two fake converted utterances (Tenor range) of different lengths in
    # the same synthesis bucket + their decode-written lf0 — the pair
    # exercises the batched (B=2) generator dispatch with per-row
    # truncation to each true length
    frame_counts = {}
    for name, secs in (("utt_Tenor_Breathy", 0.4),
                       ("utt2_Tenor_Breathy", 0.33)):
        t = np.arange(int(secs * SR)) / SR
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        write_wav(str(tmp_path / f"{name}.wav"), wav, SR)
        n_frames = len(wav) // 120  # 5 ms hop
        frame_counts[name] = n_frames
        lf0 = np.full((n_frames, 1), 220.0, np.float32)
        lf0[:5] = 0.0
        write_hdf5(str(tmp_path / f"{name}.h5"), "lf0", lf0)
    n_frames = frame_counts["utt_Tenor_Breathy"]

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

    for name, frames in frame_counts.items():
        out = str(tmp_path / f"{name}_sifigan.wav")
        assert os.path.exists(out)
        y, sr = read_wav(out)
        assert sr == SR
        # analysis frame count is len//hop + 1; allow that off-by-one frame
        assert abs(len(y) - frames * 120) <= 240
        assert np.isfinite(y).all()


def test_anasyn_mode(tmp_path):
    """--anasyn (the vendored sifigan_config/anasyn.yaml flow): no lf0
    h5 needed — F0 comes from the wav's own analysis, optionally scaled
    by --f0-factors, one output per factor."""
    from serenade_tpu.bin.ssc_postprocessing import main

    t = np.arange(int(0.4 * SR)) / SR
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "utt_Tenor_Breathy.wav"), wav, SR)

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
    sys.argv = ["prog", "--in-dir", str(tmp_path), "--config", str(cfg),
                "--anasyn", "--f0-factors", "1.0,1.5"]
    try:
        main()
    finally:
        sys.argv = old

    for suffix in ("_anasyn.wav", "_anasyn_f1.50.wav"):
        out = str(tmp_path / f"utt_Tenor_Breathy{suffix}")
        assert os.path.exists(out), out
        y, sr = read_wav(out)
        assert sr == SR and np.isfinite(y).all() and len(y) > 0

    # no lf0 h5 was present — the SSC flow would have skipped everything
    assert not os.path.exists(
        str(tmp_path / "utt_Tenor_Breathy_sifigan.wav"))

    # --f0-factors without --anasyn is a usage error
    import pytest

    sys.argv = ["prog", "--in-dir", str(tmp_path), "--config", str(cfg),
                "--f0-factors", "2.0"]
    try:
        with pytest.raises(SystemExit):
            main()
    finally:
        sys.argv = old


def test_synthesis_bucketing_tail_bound(tmp_path):
    """Bucket-padded synthesis (--synth-frame-bucket, the default) matches
    exact-length synthesis everywhere except the generator's receptive
    field at the utterance tail: edge padding enters through the convs of
    the last few thousand samples only."""
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

    t = np.arange(int(1.2 * SR)) / SR
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "utt_Tenor_Breathy.wav"), wav, SR)
    n_frames = len(wav) // 120
    lf0 = np.full((n_frames, 1), 220.0, np.float32)
    write_hdf5(str(tmp_path / "utt_Tenor_Breathy.h5"), "lf0", lf0)

    cfg = tmp_path / "post.yml"
    with open(cfg, "w") as f:
        yaml.safe_dump(dict(
            sample_rate=SR,
            noise_amp=0.0,  # deterministic excitation for the comparison
            generator=dict(
                in_channels=43, channels=32,
                upsample_scales=[5, 4, 3, 2],
                upsample_kernel_sizes=[10, 8, 6, 4],
            ),
        ), f)

    out = str(tmp_path / "utt_Tenor_Breathy_sifigan.wav")
    ys = []
    for bucket in ("0", "128"):
        old = sys.argv
        sys.argv = ["prog", "--in-dir", str(tmp_path), "--config", str(cfg),
                    "--checkpoint-path", ckpt, "--f0-backend", "yin",
                    "--synth-frame-bucket", bucket]
        try:
            main()
        finally:
            sys.argv = old
        y, _ = read_wav(out)
        ys.append(np.asarray(y, np.float32))
        os.remove(out)

    y_exact, y_bucketed = ys
    assert len(y_exact) == len(y_bucketed)
    diff = np.abs(y_exact - y_bucketed)
    n = len(diff)
    tail_rf = 6000  # 0.25 s — generous bound on the generator's RF
    assert n > 2 * tail_rf
    assert diff[: n - tail_rf].max() <= 1e-4, (
        f"bucketed synthesis deviates outside the tail receptive field: "
        f"max {diff[: n - tail_rf].max():.2e}")
    assert np.isfinite(y_bucketed).all()


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
