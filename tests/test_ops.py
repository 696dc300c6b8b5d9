"""Tests for the on-device signal ops: STFT/mel/loudness numerics against
straightforward numpy formulations, and F0 on synthetic tones."""

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.ops.f0 import yin_f0
from serenade_tpu.ops.mel import (
    a_weighting,
    hz_to_mel,
    logmelfilterbank,
    loudness_extract,
    mel_filterbank,
    mel_to_hz,
)
from serenade_tpu.ops.stft import frame_signal, stft_magnitude


SR = 24000


def make_tone(freq=440.0, dur=0.5, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_stft_matches_numpy_fft():
    x = make_tone()
    fft_size, hop, win = 512, 240, 480
    mag = np.asarray(stft_magnitude(jnp.asarray(x), fft_size, hop, win))

    # numpy reference with identical conventions
    pad = np.pad(x, (fft_size // 2, fft_size // 2), mode="reflect")
    n_frames = 1 + (len(pad) - fft_size) // hop
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    w_full = np.zeros(fft_size)
    w_full[(fft_size - win) // 2:(fft_size - win) // 2 + win] = w
    ref = np.stack([
        np.abs(np.fft.rfft(pad[i * hop:i * hop + fft_size] * w_full))
        for i in range(n_frames)
    ])
    assert mag.shape == ref.shape
    np.testing.assert_allclose(mag, ref, atol=2e-3)


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 12000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-9)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR, 512, 80, 63.0, 12000.0)
    assert fb.shape == (257, 80)
    # every filter has positive area; interior bins are covered
    assert (fb.sum(axis=0) > 0).all()


def test_logmel_tone_peak():
    x = make_tone(440.0)
    mel = np.asarray(
        logmelfilterbank(jnp.asarray(x), SR, fft_size=512, hop_size=240,
                         win_length=480, num_mels=80, fmin=63, fmax=12000,
                         eps=1e-6)
    )
    assert mel.shape[1] == 80
    # peak mel channel should match 440 Hz
    peak = mel[mel.shape[0] // 2].argmax()
    centers = mel_to_hz(np.linspace(hz_to_mel(63), hz_to_mel(12000), 82))[1:-1]
    assert abs(centers[peak] - 440.0) < 80.0


def test_a_weighting_reference_values():
    w = a_weighting(SR, 2048)
    freqs = np.linspace(0, SR / 2, 1025)
    # A-weighting is ~0 dB at 1 kHz, negative at low freqs
    i1k = np.argmin(np.abs(freqs - 1000.0))
    assert abs(w[i1k]) < 0.2
    i100 = np.argmin(np.abs(freqs - 100.0))
    assert w[i100] < -15.0


def test_loudness_monotonic_in_amplitude():
    x = make_tone()
    l1 = np.asarray(loudness_extract(jnp.asarray(x), SR, 240))
    l2 = np.asarray(loudness_extract(jnp.asarray(2 * x), SR, 240))
    assert l1.ndim == 1
    assert (l2[5:-5] > l1[5:-5]).all()


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 880.0])
def test_yin_on_pure_tones(freq):
    x = make_tone(freq, dur=0.6)
    f0, vuv = yin_f0(jnp.asarray(x), fs=SR, f0_floor=60.0, f0_ceil=1100.0)
    f0 = np.asarray(f0)
    vuv = np.asarray(vuv)
    mid = slice(10, len(f0) - 10)
    voiced = f0[mid][vuv[mid] > 0]
    assert len(voiced) > 0.9 * (len(f0) - 20)
    rel_err = np.abs(voiced - freq) / freq
    assert np.median(rel_err) < 0.01


def test_yin_silence_is_unvoiced():
    x = np.zeros(SR // 2, np.float32)
    _, vuv = yin_f0(jnp.asarray(x), fs=SR)
    assert np.asarray(vuv).sum() == 0
