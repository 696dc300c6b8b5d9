"""SiFiGAN GAN training: conditioning preparation from raw audio, segment
sampling alignment, and the full alternating step learning on one segment."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from serenade_tpu.sifigan import SiFiGANGenerator
from serenade_tpu.trainers.vocoder_trainer import (
    build_vocoder_train_step,
    create_vocoder_state,
    prepare_sifigan_utterance,
    sample_sifigan_segments,
    sifigan_forward,
)
from serenade_tpu.vocoder.hifigan import MultiPeriodDiscriminator

SR = 24000
UP = (5, 4, 3, 2)  # hop 120 (5 ms at 24 kHz, the official sifigan regime)
HOP = 120


def _singing_wav(dur=1.0, f0=220.0):
    t = np.arange(int(SR * dur)) / SR
    f0t = f0 * (1 + 0.02 * np.sin(2 * np.pi * 5.0 * t))
    ph = 2 * np.pi * np.cumsum(f0t) / SR
    return sum((0.4 / h) * np.sin(h * ph) for h in range(1, 5)).astype(
        np.float32)


def test_prepare_and_sample_alignment():
    item = prepare_sifigan_utterance(
        _singing_wav(), SR, mcep_dim=10, upsample_scales=UP,
    )
    assert item is not None
    n = item["c"].shape[0]
    assert item["c"].shape[1] == 10 + 1 + 3  # mcep (order+1) + 3 bap bands
    assert item["sine"].shape[0] == n * HOP
    assert item["wav"].shape[0] == n * HOP
    cum = np.cumprod(UP)
    for d, cm in zip(item["dfs"], cum):
        assert d.shape[0] == n * cm
        assert np.all(d >= 1.0)
    # sine excitation is periodic at the analyzed f0 on voiced frames
    assert np.abs(item["sine"]).max() > 0.01

    rng = np.random.default_rng(0)
    batch = sample_sifigan_segments([item], rng, 2, 8, HOP,
                                    upsample_scales=UP)
    assert batch["c"].shape == (2, 8, 14)
    assert batch["sine"].shape[1] == 8 * HOP
    assert batch["wav"].shape == (2, 8 * HOP, 1)
    for d, cm in zip(batch["dfs"], cum):
        assert d.shape == (2, 8 * cm)


def test_sifigan_gan_step_learns():
    gen = SiFiGANGenerator(
        in_channels=14, channels=32, upsample_scales=UP,
        upsample_kernel_sizes=tuple(2 * u for u in UP),
        filter_resblock_kernel_sizes=(3,),
        filter_resblock_dilations=((1, 3),),
    )
    disc = MultiPeriodDiscriminator(periods=(2, 3))

    item = prepare_sifigan_utterance(
        _singing_wav(), SR, mcep_dim=10, upsample_scales=UP,
    )
    rng = np.random.default_rng(0)
    batch_np = sample_sifigan_segments([item], rng, 2, 8, HOP,
                                       upsample_scales=UP)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    gen_params = gen.init(jax.random.key(0), batch["sine"], batch["c"],
                          list(batch["dfs"]))
    disc_params = disc.init(jax.random.key(1), batch["wav"])
    gen_tx = optax.adam(2e-3)
    disc_tx = optax.adam(2e-3)
    state = create_vocoder_state(gen_params, disc_params, gen_tx, disc_tx)
    step = build_vocoder_train_step(
        gen, disc, gen_tx, disc_tx, sampling_rate=SR, donate=False,
        gen_forward=sifigan_forward(gen),
    )

    mels = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.key(i))
        m = jax.device_get(metrics)
        assert all(np.isfinite(float(v)) for v in m.values())
        mels.append(float(m["train/mel_loss"]))
    assert int(state.step) == 12
    # overfitting one segment: mel reconstruction must improve
    assert np.mean(mels[-3:]) < np.mean(mels[:3])
