"""Tests for WORLD-class analysis and SPTK mel-cepstrum ops."""

import numpy as np
import jax.numpy as jnp

from serenade_tpu.ops.sptk import ALPHA, freqt, mc2sp, sp2mc
from serenade_tpu.ops.world import (
    aperiodicity_spectrum,
    band_aperiodicity,
    cheaptrick,
)

SR = 24000


def harmonic_tone(f0=220.0, dur=0.5, sr=SR, n_harm=8, tilt=0.7):
    t = np.arange(int(dur * sr)) / sr
    sig = sum(
        (tilt ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
        for k in range(n_harm)
    )
    return (0.3 * sig / np.max(np.abs(sig))).astype(np.float32)


def test_freqt_identity_alpha0():
    c = np.random.default_rng(0).normal(size=(5, 16))
    out = freqt(c, 15, 0.0)
    np.testing.assert_allclose(out, c, atol=1e-12)


def test_sp2mc_mc2sp_roundtrip_alpha0_full_order():
    rng = np.random.default_rng(1)
    fftlen = 64
    sp = np.exp(rng.normal(size=(3, fftlen // 2 + 1)))
    mc = sp2mc(sp, fftlen // 2, 0.0)
    rec = mc2sp(mc, 0.0, fftlen)
    np.testing.assert_allclose(rec, sp, rtol=1e-8)


def test_sp2mc_warped_roundtrip_is_smooth_approx():
    fftlen = 256
    freqs = np.linspace(0, np.pi, fftlen // 2 + 1)
    sp = np.exp(np.cos(freqs) * 2.0)[None, :]  # smooth spectrum
    mc = sp2mc(sp, 30, ALPHA[SR])
    rec = mc2sp(mc, ALPHA[SR], fftlen)
    err = np.abs(np.log(rec) - np.log(sp)).mean()
    assert err < 0.05


def test_cheaptrick_envelope_shape_and_level():
    x = harmonic_tone()
    T = len(x) // 120  # 5 ms hop
    f0 = np.full(T, 220.0, np.float32)
    env = np.asarray(cheaptrick(jnp.asarray(x), jnp.asarray(f0), fs=SR,
                                frame_period_ms=5.0))
    assert env.shape[0] == T
    assert np.isfinite(env).all() and (env > 0).all()
    mid = env[T // 2]
    fft_size = (env.shape[1] - 1) * 2
    freqs = np.fft.rfftfreq(fft_size, 1 / SR)
    # envelope energy concentrated in the harmonic region (< 2.5 kHz),
    # well above the level at 8 kHz where the tone has no energy
    low = mid[(freqs > 150) & (freqs < 2500)].mean()
    high = mid[(freqs > 7000) & (freqs < 11000)].mean()
    assert low / high > 100.0


def test_band_aperiodicity_voiced_vs_noise():
    x_tone = harmonic_tone()
    rng = np.random.default_rng(0)
    x_noise = (0.3 * rng.normal(size=len(x_tone))).astype(np.float32)
    T = len(x_tone) // 120
    f0 = np.full(T, 220.0, np.float32)
    bap_tone = np.asarray(band_aperiodicity(jnp.asarray(x_tone),
                                            jnp.asarray(f0), fs=SR))
    bap_noise = np.asarray(band_aperiodicity(jnp.asarray(x_noise),
                                             jnp.asarray(f0), fs=SR))
    assert bap_tone.shape == (T, 3)  # 3 coarse bands at 24 kHz
    # tone: strongly periodic (very negative dB); noise: near 0 dB
    assert bap_tone[5:-5, 0].mean() < -10.0
    assert bap_noise[5:-5].mean() > -5.0

    full = aperiodicity_spectrum(bap_tone, SR, 1024)
    assert full.shape == (T, 513)
    assert ((full > 0) & (full <= 1.0 + 1e-6)).all()
