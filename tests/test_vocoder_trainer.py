"""Vocoder GAN training step: losses finite, both networks update, and the
mel reconstruction term decreases when overfitting a single segment."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from serenade_tpu.trainers.vocoder_trainer import (
    build_vocoder_train_step,
    create_vocoder_state,
    sample_mel_wav_segments,
)
from serenade_tpu.vocoder.hifigan import (
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
)

SR = 24000


def test_segment_sampler_alignment():
    rng = np.random.default_rng(0)
    items = [{"logmel": np.arange(100 * 4).reshape(100, 4).astype(np.float32),
              "wave": np.arange(100 * 240).astype(np.float32)}]
    batch = sample_mel_wav_segments(items, rng, 3, 16, 240)
    assert batch["mel"].shape == (3, 16, 4)
    assert batch["wav"].shape == (3, 16 * 240, 1)
    # alignment: first wav sample of the crop == start_frame * hop
    for b in range(3):
        start_frame = int(batch["mel"][b, 0, 0] // 4)
        assert batch["wav"][b, 0, 0] == start_frame * 240


def test_gan_step_updates_and_learns():
    gen = HiFiGANGenerator(in_channels=8, channels=16,
                           upsample_scales=(4, 2),
                           upsample_kernel_sizes=(8, 4),
                           resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 3),))
    disc = MultiPeriodDiscriminator(periods=(2, 3),
                                    )
    b, frames, hop = 2, 16, 8
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(b, frames, 8)), jnp.float32)
    t = np.arange(frames * hop) / SR
    wav = jnp.asarray(
        np.stack([0.5 * np.sin(2 * np.pi * 440 * t)] * b)[..., None],
        jnp.float32,
    )
    batch = {"mel": mel, "wav": wav}

    gen_params = gen.init(jax.random.key(0), mel)
    disc_params = disc.init(jax.random.key(1), wav)
    gen_tx = optax.adam(2e-3)
    disc_tx = optax.adam(2e-3)
    state = create_vocoder_state(gen_params, disc_params, gen_tx, disc_tx)
    step = build_vocoder_train_step(gen, disc, gen_tx, disc_tx,
                                    sampling_rate=SR, donate=False)

    mels = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.key(i))
        m = jax.device_get(metrics)
        assert all(np.isfinite(float(v)) for v in m.values())
        mels.append(float(m["train/mel_loss"]))
    assert int(state.step) == 12
    # overfitting one segment: mel reconstruction must improve
    assert np.mean(mels[-3:]) < np.mean(mels[:3])
    # both parameter sets moved
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state.gen_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(gen_params)[0]),
    )
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(state.disc_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(disc_params)[0]),
    )


def test_vocoder_train_cli_artifacts_load_into_vocoder(tmp_path):
    """The complete self-trained-vocoder loop: the CLI trains a tiny
    HiFiGAN, writes checkpoint + identity stats.h5 + config.yml, and the
    Vocoder wrapper loads that trio directly and synthesizes."""
    import sys

    import yaml

    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.vocoder import Vocoder

    dump = tmp_path / "dump"
    dump.mkdir()
    t = np.arange(24000) / SR
    for i, f0 in enumerate((220.0, 330.0)):
        wav = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        write_hdf5(str(dump / f"utt{i}.h5"), "wave", wav)
        write_hdf5(str(dump / f"utt{i}.h5"), "logmel",
                   np.random.default_rng(i).normal(
                       size=(len(wav) // 48, 8)).astype(np.float32))

    cfg = dict(sampling_rate=SR, num_mels=8, hop_size=48,
               segment_frames=8, vocoder_batch_size=2,
               vocoder_train_max_steps=2, save_interval_steps=2,
               log_interval_steps=1,
               generator_params=dict(channels=16, in_channels=8,
                                     upsample_scales=[8, 6],
                                     upsample_kernel_sizes=[16, 12],
                                     resblock_kernel_sizes=[3],
                                     resblock_dilations=[[1, 3]]))
    cfg_path = tmp_path / "voc.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from serenade_tpu.bin.vocoder_train import main

    outdir = str(tmp_path / "exp")
    old = sys.argv
    sys.argv = ["prog", "--train-dumpdir", str(dump), "--outdir", outdir,
                "--config", str(cfg_path)]
    try:
        main()
    finally:
        sys.argv = old

    import os

    assert os.path.exists(os.path.join(outdir, "stats.h5"))
    assert os.path.exists(os.path.join(outdir, "config.yml"))
    ckpt = os.path.join(outdir, "checkpoint-2steps")
    assert os.path.isdir(ckpt)

    voc = Vocoder(ckpt, os.path.join(outdir, "config.yml"),
                  os.path.join(outdir, "stats.h5"), take_norm_feat=False)
    wav, sr = voc.decode(np.random.default_rng(0).normal(
        size=(10, 8)).astype(np.float32))
    assert sr == SR and wav.shape[0] == 10 * 48
    assert np.isfinite(wav).all()
