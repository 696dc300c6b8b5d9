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
