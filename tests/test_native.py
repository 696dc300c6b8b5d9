"""Native C++ DSP library vs the JAX/numpy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.native import (
    freqt_native, harvest_f0_native, native_available, yin_f0_native,
)
from serenade_tpu.ops.f0 import yin_f0
from serenade_tpu.ops.harvest import harvest_f0
from serenade_tpu.ops.sptk import freqt

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not buildable"
)

SR = 24000


def test_freqt_native_matches_numpy():
    rng = np.random.default_rng(0)
    c = rng.normal(size=(7, 65))
    a = freqt(c, 24, 0.466)
    b = freqt_native(c, 24, 0.466)
    np.testing.assert_allclose(a, b, rtol=1e-10)


@pytest.mark.parametrize("freq", [130.0, 440.0])
def test_yin_native_matches_jax(freq):
    t = np.arange(int(0.5 * SR)) / SR
    x = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    f0_n, vuv_n = yin_f0_native(x, fs=SR)
    f0_j, vuv_j = yin_f0(jnp.asarray(x), fs=SR)
    f0_j = np.asarray(f0_j)
    # same frames voiced, same pitch to sub-cent accuracy
    agree = (vuv_n > 0) == (np.asarray(vuv_j) > 0)
    assert agree.mean() > 0.95
    both = (vuv_n > 0) & (np.asarray(vuv_j) > 0)
    np.testing.assert_allclose(f0_n[both], f0_j[both], rtol=1e-3)
    assert abs(np.median(f0_n[vuv_n > 0]) - freq) < freq * 0.01


def test_harvest_native_matches_jax():
    """C++ and JAX Harvest share algorithm + constants; only the decimation
    filter differs (windowed sinc vs ideal FFT truncation), so agreement is
    cents-level, not bitwise."""
    t = np.arange(int(1.0 * SR)) / SR
    f0t = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
    ph = 2 * np.pi * np.cumsum(f0t) / SR
    x = sum((0.6 / h) * np.sin(h * ph) for h in range(1, 7)).astype(np.float32)
    x[:2400] = 0.0
    f0_n, vuv_n = harvest_f0_native(x, fs=SR, f0_floor=80.0, f0_ceil=800.0)
    f0_j, vuv_j = (np.asarray(a) for a in harvest_f0(
        jnp.asarray(x), fs=SR, f0_floor=80.0, f0_ceil=800.0))
    agree = (vuv_n > 0) == (vuv_j > 0)
    assert agree.mean() > 0.9, f"V/UV agreement {agree.mean():.2f}"
    both = (vuv_n > 0) & (vuv_j > 0)
    assert both.sum() >= 50
    cents = 1200.0 * np.abs(np.log2(f0_n[both] / f0_j[both]))
    assert np.median(cents) < 2.0, f"median {np.median(cents):.2f} cents"
    assert cents.max() < 20.0, f"max {cents.max():.2f} cents"
    # silence stays unvoiced in both
    assert vuv_n[:8].sum() == 0
