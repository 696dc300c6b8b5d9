"""Vocoder GAN loss tests with the implemented discriminators."""

import jax
import jax.numpy as jnp
import numpy as np

from serenade_tpu.vocoder.hifigan import MultiScaleMultiPeriodDiscriminator
from serenade_tpu.vocoder.losses import (
    discriminator_adversarial_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    multi_resolution_mel_loss,
)


def test_adversarial_and_fm_losses():
    disc = MultiScaleMultiPeriodDiscriminator()
    wav_real = jax.random.normal(jax.random.key(0), (1, 4096, 1)) * 0.2
    wav_fake = jax.random.normal(jax.random.key(1), (1, 4096, 1)) * 0.2
    params = disc.init(jax.random.key(2), wav_real)
    outs_real = disc.apply(params, wav_real)
    outs_fake = disc.apply(params, wav_fake)

    g = float(generator_adversarial_loss(outs_fake))
    d = float(discriminator_adversarial_loss(outs_real, outs_fake))
    fm = float(feature_matching_loss(outs_fake, outs_real))
    assert np.isfinite(g) and g > 0
    assert np.isfinite(d) and d > 0
    assert np.isfinite(fm) and fm > 0
    # identical inputs: fm == 0, generator loss unchanged form
    fm_same = float(feature_matching_loss(outs_real, outs_real))
    assert fm_same == 0.0


def test_multi_resolution_mel_loss_orders_similarity():
    t = np.arange(24000) / 24000
    clean = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    near = clean + 0.01 * np.random.default_rng(0).standard_normal(len(t)).astype(np.float32)
    far = np.random.default_rng(1).standard_normal(len(t)).astype(np.float32)
    l_near = float(multi_resolution_mel_loss(jnp.asarray(near), jnp.asarray(clean)))
    l_far = float(multi_resolution_mel_loss(jnp.asarray(far), jnp.asarray(clean)))
    l_same = float(multi_resolution_mel_loss(jnp.asarray(clean), jnp.asarray(clean)))
    assert l_same < 1e-6
    assert l_near < l_far
