"""Viterbi-decoded YIN: pitch accuracy, vibrato tracking, octave robustness."""

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.ops.f0 import yin_f0, yin_f0_viterbi

SR = 24000


def tone(freq, dur=0.6, vibrato_hz=0.0, vibrato_depth=0.0, noise=0.0,
         seed=0):
    t = np.arange(int(dur * SR)) / SR
    f_inst = freq * (1.0 + vibrato_depth * np.sin(2 * np.pi * vibrato_hz * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / SR
    x = 0.4 * np.sin(phase)
    if noise:
        x = x + noise * np.random.default_rng(seed).standard_normal(len(t))
    return x.astype(np.float32)


@pytest.mark.parametrize("freq", [110.0, 440.0, 880.0])
def test_viterbi_pure_tones(freq):
    f0, vuv = yin_f0_viterbi(jnp.asarray(tone(freq)), fs=SR)
    f0 = np.asarray(f0)
    voiced = f0[np.asarray(vuv) > 0][10:-10]
    assert len(voiced) > 30
    assert np.median(np.abs(voiced - freq) / freq) < 0.01


def test_viterbi_tracks_vibrato():
    f0, vuv = yin_f0_viterbi(
        jnp.asarray(tone(330.0, vibrato_hz=5.0, vibrato_depth=0.02)), fs=SR
    )
    f0 = np.asarray(f0)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    # vibrato spans ±2%: tracked range should cover most of it, no octaves
    assert voiced.min() > 330 * 0.96 and voiced.max() < 330 * 1.04
    assert voiced.max() - voiced.min() > 330 * 0.02


def test_viterbi_octave_stability_under_noise():
    """With added noise, plain peak-picking occasionally jumps octaves;
    the Viterbi path must stay within one semitone of the true pitch."""
    x = tone(220.0, dur=0.8, noise=0.05)
    f0_v, vuv_v = yin_f0_viterbi(jnp.asarray(x), fs=SR)
    f0_v = np.asarray(f0_v)
    voiced = f0_v[np.asarray(vuv_v) > 0][10:-10]
    ratio = voiced / 220.0
    octave_errors = np.mean((ratio > 1.5) | (ratio < 0.66))
    assert octave_errors < 0.01
    assert np.median(np.abs(voiced - 220.0)) < 4.0


def test_viterbi_silence_unvoiced():
    x = np.zeros(SR // 2, np.float32)
    _, vuv = yin_f0_viterbi(jnp.asarray(x), fs=SR)
    assert np.asarray(vuv).sum() == 0


def test_viterbi_voiced_unvoiced_segmentation():
    sil = np.zeros(int(0.2 * SR), np.float32)
    x = np.concatenate([sil, tone(262.0, dur=0.4), sil])
    f0, vuv = yin_f0_viterbi(jnp.asarray(x), fs=SR)
    vuv = np.asarray(vuv)
    n = len(vuv)
    a, b = int(0.2 / 0.01), int(0.6 / 0.01)
    assert vuv[:a - 3].mean() < 0.15
    assert vuv[a + 3:b - 3].mean() > 0.9
    assert vuv[b + 3:].mean() < 0.15
