"""GAN training losses for the vocoder family.

The reference ships HiFiGAN discriminators but never trains them in-tree
(the vocoder arrives pretrained; SURVEY §2.1).  These losses make the
implemented discriminator family usable for vocoder training/fine-tuning
on TPU: LSGAN adversarial terms, feature matching, and a multi-resolution
log-mel reconstruction loss built on the on-device mel op.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from serenade_tpu.ops.mel import mel_filterbank
from serenade_tpu.ops.stft import stft_magnitude


def generator_adversarial_loss(disc_outputs: Sequence) -> jnp.ndarray:
    """LSGAN generator loss: mean((1 - D(G(z)))^2) over discriminators.

    ``disc_outputs`` is a list of (score, fmaps) tuples as returned by the
    discriminator modules.
    """
    losses = [jnp.mean(jnp.square(1.0 - score)) for score, _ in disc_outputs]
    return sum(losses) / len(losses)


def discriminator_adversarial_loss(real_outputs: Sequence,
                                   fake_outputs: Sequence) -> jnp.ndarray:
    """LSGAN discriminator loss: real → 1, fake → 0."""
    losses = []
    for (real, _), (fake, _) in zip(real_outputs, fake_outputs):
        losses.append(jnp.mean(jnp.square(1.0 - real))
                      + jnp.mean(jnp.square(fake)))
    return sum(losses) / len(losses)


def feature_matching_loss(fake_outputs: Sequence,
                          real_outputs: Sequence) -> jnp.ndarray:
    """L1 between fake/real intermediate feature maps, averaged."""
    total = 0.0
    count = 0
    for (_, fmaps_fake), (_, fmaps_real) in zip(fake_outputs, real_outputs):
        for ff, fr in zip(fmaps_fake, fmaps_real):
            total = total + jnp.mean(jnp.abs(ff - fr))
            count += 1
    return total / max(count, 1)


def multi_resolution_mel_loss(
    wav_hat,
    wav,
    sampling_rate: int = 24000,
    resolutions: Tuple[Tuple[int, int, int], ...] = (
        (512, 120, 480), (1024, 240, 960), (2048, 480, 1920),
    ),
    num_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """L1 log-mel distance at several STFT resolutions.

    wav_hat/wav: (T,) or (B, T) waveforms.
    """
    fmax = fmax or sampling_rate / 2.0
    if wav_hat.ndim == 1:
        wav_hat = wav_hat[None]
        wav = wav[None]
    total = 0.0
    for fft_size, hop, win in resolutions:
        basis = jnp.asarray(
            mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax)
        )

        def logmel(w):
            mag = stft_magnitude(w, fft_size, hop, win)
            return jnp.log(jnp.maximum(mag @ basis, 1e-5))

        for b in range(wav.shape[0]):
            total = total + jnp.mean(
                jnp.abs(logmel(wav_hat[b]) - logmel(wav[b]))
            )
    return total / (len(resolutions) * wav.shape[0])


def residual_loss(
    source_hat,
    wav,
    cf0,
    *,
    sampling_rate: int = 24000,
    fft_size: int = 2048,
    hop_size: int = 120,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    f0_floor: float = 100.0,
    f0_ceil: float = 840.0,
) -> jnp.ndarray:
    """SiFiGAN source-regularization loss (``lambda_reg`` term).

    TPU-native counterpart of the external ``sifigan.losses.ResidualLoss``
    the reference recipe trains with (every hyperparameter default here
    mirrors reference bin/sifigan_config/train/sifigan.yaml:27-41: fft
    2048, hop 120, f0 100-840, 80 mels, magnitude domain 'power: false',
    'elim_0th: true').  The target for the source network's excitation is
    the natural waveform's envelope-removed residual: |STFT(y)| divided by
    the CheapTrick magnitude envelope along the continuous-F0 track, with
    the envelope's 0th cepstrum eliminated so the excitation must carry
    the signal power.  Loss = MSE between log-mel-compressed magnitudes
    of the excitation and that residual target.

    Args:
        source_hat: (B, T, 1) source-network excitation output.
        wav: (B, T, 1) natural waveform.
        cf0: (B, n_frames) continuous F0 in Hz at ``hop_size`` frames
            (``n_frames * hop_size == T`` — the SiFiGAN conditioning grid).
    """
    from serenade_tpu.ops.world import cheaptrick

    fmax = fmax or sampling_rate / 2.0
    basis = jnp.asarray(
        mel_filterbank(sampling_rate, fft_size, n_mels, fmin, fmax)
    )
    frame_period_ms = 1000.0 * hop_size / sampling_rate
    n = cf0.shape[1]

    def per_item(s, y, f0):
        f0 = jnp.clip(f0, f0_floor, f0_ceil)
        env = cheaptrick(y, f0, fs=sampling_rate, f0_floor=f0_floor,
                         frame_period_ms=frame_period_ms,
                         fft_size=fft_size, elim_0th=True)  # power (n, F)
        mag_y = stft_magnitude(y, fft_size, hop_size)[:n]
        mag_s = stft_magnitude(s, fft_size, hop_size)[:n]
        target = mag_y * jax.lax.rsqrt(jnp.maximum(env, 1e-12))
        lm_t = jnp.log(jnp.maximum(target @ basis, 1e-5))
        lm_s = jnp.log(jnp.maximum(mag_s @ basis, 1e-5))
        return jnp.mean(jnp.square(lm_s - lm_t))

    return jnp.mean(jax.vmap(per_item)(source_hat[..., 0], wav[..., 0], cf0))
