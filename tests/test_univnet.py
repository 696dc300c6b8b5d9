"""UnivNet discriminators + SiFiGAN source-regularization (residual) loss.

The reference trains its stage-9 SiFiGAN against a UnivNet MR-spectral +
MPD adversary with a residual loss on the source excitation
(ref bin/sifigan_config/train.yaml:6, train/sifigan.yaml:12,27-41); these
tests pin the TPU-native counterparts' contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from serenade_tpu.vocoder.losses import residual_loss
from serenade_tpu.vocoder.univnet import (
    SpectralDiscriminator,
    UnivNetMultiResolutionMultiPeriodDiscriminator,
)

SR = 24000


def _harmonic(n, f0=220.0, n_harm=6, noise=0.0, seed=0):
    t = np.arange(n) / SR
    # decaying harmonic comb (+ optional breathiness noise) — a crude
    # vocal-like spectrum; without noise the spectral valleys are
    # numerically empty, which no real recording has
    wav = sum((0.4 / h) * np.sin(2 * np.pi * h * f0 * t)
              for h in range(1, n_harm + 1)).astype(np.float32)
    if noise:
        wav = wav + noise * np.random.default_rng(seed).standard_normal(
            n).astype(np.float32)
    return wav


def test_spectral_discriminator_shapes_and_fmaps():
    disc = SpectralDiscriminator(fft_size=512, hop_size=120, win_length=240,
                                 channels=8)
    wav = jnp.asarray(_harmonic(4800))[None, :, None]
    params = disc.init(jax.random.key(0), wav)
    score, fmaps = disc.apply(params, wav)
    # 6 conv layers, each recorded; last fmap IS the score map
    assert len(fmaps) == 6
    assert score.shape[-1] == 1
    assert fmaps[-1].shape == score.shape
    # VALID (3,9)/(3,3) convs: time axis shrinks by 2 per layer
    frames = 4800 // 120 + 1
    assert score.shape[1] == frames - 2 * 6
    # freq axis: 257 → three stride-2 halvings interleaved with k9/k3 VALID
    assert score.shape[2] < 257 // 8
    assert np.isfinite(np.asarray(score)).all()


def test_univnet_mrmpd_output_structure():
    disc = UnivNetMultiResolutionMultiPeriodDiscriminator(periods=(2, 3))
    wav = jnp.asarray(_harmonic(4800))[None, :, None]
    params = disc.init(jax.random.key(0), wav)
    outs = disc.apply(params, wav)
    # 3 spectral resolutions + 2 periods, each a (score, fmaps) pair
    assert len(outs) == 5
    for score, fmaps in outs:
        assert np.isfinite(np.asarray(score)).all()
        assert len(fmaps) >= 5


def test_cheaptrick_elim_0th_removes_gain():
    """elim_0th zeroes the envelope's 0th cepstrum: the log envelope has
    (near-)zero mean per frame, i.e. geometric-mean gain 1 regardless of
    signal level — the property that forces the source excitation to
    carry the power."""
    from serenade_tpu.ops.world import cheaptrick

    wav = jnp.asarray(_harmonic(4800, noise=1e-3))
    f0 = jnp.full((40,), 220.0)
    env = cheaptrick(wav, f0, fs=SR, frame_period_ms=5.0, fft_size=2048,
                     elim_0th=True)
    env_loud = cheaptrick(wav * 8.0, f0, fs=SR, frame_period_ms=5.0,
                          fft_size=2048, elim_0th=True)
    # recover c0 of the log envelope: irfft over the symmetric spectrum
    c0 = np.fft.irfft(np.log(np.asarray(env)), n=2048, axis=1)[:, 0]
    assert np.abs(c0).max() < 1e-3
    # gain invariance: scaling the waveform 8x leaves the envelope
    # (log-)unchanged (the 18 dB go to the residual target instead).
    # Exact by construction: cheaptrick normalizes per-frame gain before
    # the fp32 smoothing cumsum and restores it as a log constant
    assert np.abs(np.log(np.asarray(env_loud)) -
                  np.log(np.asarray(env))).max() < 1e-3


def test_residual_loss_minimizable_and_differentiable():
    """The loss admits a waveform that matches the envelope-removed
    residual: direct gradient descent on a free excitation signal drives
    it far below the noise initialization (the property the source
    network trains under)."""
    import optax

    n_frames, hop = 40, 120
    n = n_frames * hop
    # breathiness noise keeps the whitened target's spectral valleys off
    # the log floor (a floor-clamped target has zero gradient there)
    wav = jnp.asarray(_harmonic(n, noise=0.01)[None, :, None])
    cf0 = jnp.asarray(np.full((1, n_frames), 220.0, np.float32))

    loss_fn = jax.jit(lambda s: residual_loss(s, wav, cf0, sampling_rate=SR,
                                              hop_size=hop, fft_size=1024))
    s = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal(
        (1, n, 1)).astype(np.float32))
    l0 = float(loss_fn(s))
    assert np.isfinite(l0) and l0 > 0

    tx = optax.adam(5e-2)
    opt = tx.init(s)
    grad_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(400):
        g = grad_fn(s)
        upd, opt = tx.update(g, opt, s)
        s = optax.apply_updates(s, upd)
    l1 = float(loss_fn(s))
    assert np.isfinite(l1)
    # plateaus around 0.37*l0: the hann leakage floor bounds how deep a
    # real waveform's spectral valleys can go vs the whitened target
    assert l1 < 0.45 * l0


def test_sifigan_step_with_univnet_and_reg_learns():
    """Full alternating GAN step with the reference adversary + residual
    loss: all terms finite, reg + mel losses improve on one segment."""
    from serenade_tpu.sifigan import SiFiGANGenerator
    from serenade_tpu.trainers.vocoder_trainer import (
        build_vocoder_train_step,
        create_vocoder_state,
        prepare_sifigan_utterance,
        sample_sifigan_segments,
        sifigan_forward,
    )

    UP = (5, 4, 3, 2)
    HOP = 120
    t = np.arange(SR) / SR
    f0t = 220.0 * (1 + 0.02 * np.sin(2 * np.pi * 5.0 * t))
    ph = 2 * np.pi * np.cumsum(f0t) / SR
    wav = sum((0.4 / h) * np.sin(h * ph) for h in range(1, 5)).astype(
        np.float32)
    wav = wav + 0.005 * np.random.default_rng(7).standard_normal(
        len(wav)).astype(np.float32)

    item = prepare_sifigan_utterance(wav, SR, mcep_dim=10,
                                     upsample_scales=UP)
    assert item is not None and "cf0" in item
    rng = np.random.default_rng(0)
    # 32 frames = 3840 samples: enough STFT frames for the fft-2048
    # spectral discriminator's VALID conv stack (guarded in the module)
    batch_np = sample_sifigan_segments([item], rng, 2, 32, HOP,
                                       upsample_scales=UP)
    assert batch_np["cf0"].shape == (2, 32)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    gen = SiFiGANGenerator(
        in_channels=14, channels=32, upsample_scales=UP,
        upsample_kernel_sizes=tuple(2 * u for u in UP),
        filter_resblock_kernel_sizes=(3,),
        filter_resblock_dilations=((1, 3),),
    )
    disc = UnivNetMultiResolutionMultiPeriodDiscriminator(periods=(2, 3))

    gen_params = gen.init(jax.random.key(0), batch["sine"], batch["c"],
                          list(batch["dfs"]))
    disc_params = disc.init(jax.random.key(1), batch["wav"])
    gen_tx = optax.adam(2e-3)
    disc_tx = optax.adam(2e-3)
    state = create_vocoder_state(gen_params, disc_params, gen_tx, disc_tx)

    def reg_loss_fn(aux, b):
        return residual_loss(aux, b["wav"], b["cf0"], sampling_rate=SR,
                             hop_size=HOP, fft_size=1024)

    step = build_vocoder_train_step(
        gen, disc, gen_tx, disc_tx, sampling_rate=SR, donate=False,
        lambda_reg=1.0, gen_forward=sifigan_forward(gen, with_excitation=True),
        reg_loss_fn=reg_loss_fn,
    )

    mels, regs = [], []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.key(i))
        m = jax.device_get(metrics)
        assert all(np.isfinite(float(v)) for v in m.values())
        assert "train/reg_loss" in m
        mels.append(float(m["train/mel_loss"]))
        regs.append(float(m["train/reg_loss"]))
    assert np.mean(mels[-3:]) < np.mean(mels[:3])
    # 10 steps against a 45x-weighted mel term is too few for the
    # 1x-weighted reg term to fall monotonically — assert it stays
    # bounded here; its trainability is pinned by
    # test_residual_loss_minimizable_and_differentiable
    assert max(regs) < 1.5 * regs[0] + 10.0


def test_reg_loss_requires_aux():
    from serenade_tpu.trainers.vocoder_trainer import (
        build_vocoder_train_step, create_vocoder_state,
    )
    from serenade_tpu.vocoder.hifigan import (
        HiFiGANGenerator, MultiPeriodDiscriminator,
    )

    gen = HiFiGANGenerator(in_channels=4, channels=8, upsample_scales=(4, 2),
                           upsample_kernel_sizes=(8, 4),
                           resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 3),))
    disc = MultiPeriodDiscriminator(periods=(2,))
    mel = jnp.zeros((1, 8, 4))
    wav = jnp.zeros((1, 64, 1))
    gen_params = gen.init(jax.random.key(0), mel)
    disc_params = disc.init(jax.random.key(1), wav)
    tx = optax.adam(1e-3)
    state = create_vocoder_state(gen_params, disc_params, tx, tx)
    step = build_vocoder_train_step(
        gen, disc, tx, tx, donate=False, lambda_reg=1.0,
        reg_loss_fn=lambda aux, b: jnp.mean(aux),
    )
    # the default (wav-only) gen_forward cannot feed a reg loss
    with pytest.raises(ValueError, match="returns \\(waveform, aux\\)"):
        step(state, {"mel": mel, "wav": wav}, jax.random.key(0))
