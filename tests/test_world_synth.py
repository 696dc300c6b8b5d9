"""WORLD-class analysis-synthesis round trip: pitch and spectral shape of
the resynthesized tone must match the original."""

import numpy as np
import jax.numpy as jnp

from serenade_tpu.ops.f0 import yin_f0
from serenade_tpu.ops.world_synth import anasyn

SR = 24000


def test_anasyn_preserves_pitch_and_band():
    t = np.arange(int(0.6 * SR)) / SR
    sig = sum((0.6 ** k) * np.sin(2 * np.pi * 220 * (k + 1) * t)
              for k in range(6))
    x = (0.3 * sig / np.max(np.abs(sig))).astype(np.float32)

    y = anasyn(x, SR, f0min=100, f0max=500)
    assert np.isfinite(y).all()
    assert len(y) >= int(0.5 * SR)

    # pitch preserved
    f0, vuv = yin_f0(jnp.asarray(y), fs=SR, f0_floor=100, f0_ceil=500)
    f0 = np.asarray(f0)
    voiced = f0[np.asarray(vuv) > 0]
    assert len(voiced) > 20
    assert abs(np.median(voiced) - 220.0) < 5.0

    # energy lives in the harmonic band, not above 6 kHz
    spec = np.abs(np.fft.rfft(y[: SR // 2]))
    freqs = np.fft.rfftfreq(SR // 2, 1 / SR)
    low = spec[(freqs > 150) & (freqs < 2000)].mean()
    high = spec[(freqs > 6000)].mean()
    assert low / max(high, 1e-9) > 10.0


def test_anasyn_noise_for_unvoiced():
    rng = np.random.default_rng(0)
    x = (0.2 * rng.standard_normal(int(0.4 * SR))).astype(np.float32)
    y = anasyn(x, SR)
    assert np.isfinite(y).all()
    # output remains noise-like: no spurious strong pitch
    f0, vuv = yin_f0(jnp.asarray(y), fs=SR)
    assert np.asarray(vuv).mean() < 0.5
