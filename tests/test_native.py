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


def _harmonic(seconds=0.6, f0=220.0, tilt=1.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    ph = 2 * np.pi * f0 * t
    x = sum((0.5 / h**tilt) * np.sin(h * ph) for h in range(1, 9))
    if noise:
        x = x + noise * rng.standard_normal(len(t))
    return x.astype(np.float32)


def test_cheaptrick_native_matches_jax():
    """C++ CheapTrick vs ops/world.py: same algorithm step for step;
    difference is float64 vs float32 FFT accumulation, so agreement is a
    log-spectral-distance bound, not bitwise."""
    from serenade_tpu.native import cheaptrick_native
    from serenade_tpu.ops.f0 import yin_f0
    from serenade_tpu.ops.world import cheaptrick

    x = _harmonic(noise=0.01)
    f0, _ = yin_f0(jnp.asarray(x), fs=SR)
    f0 = np.asarray(f0)
    sp_j = np.asarray(cheaptrick(jnp.asarray(x), jnp.asarray(f0), fs=SR))
    sp_n = cheaptrick_native(x, f0, fs=SR)
    assert sp_n.shape == sp_j.shape
    # level-floored LSD: the depth of inter-harmonic notches 40+ dB below
    # the frame peak is ill-conditioned between f32 (JAX) and f64 (C++)
    # accumulation; floor both at peak-40 dB before comparing
    floor = sp_j.max(axis=1, keepdims=True) * 1e-4
    lj = 10 * np.log10(np.maximum(sp_j, floor))
    ln = 10 * np.log10(np.maximum(sp_n, floor))
    lsd = np.sqrt(np.mean((ln - lj) ** 2, axis=1))
    assert np.median(lsd) < 0.1, f"median LSD {np.median(lsd):.3f} dB"
    assert lsd.max() < 0.5, f"max LSD {lsd.max():.3f} dB"


def test_band_aperiodicity_native_matches_jax():
    from serenade_tpu.native import band_aperiodicity_native
    from serenade_tpu.ops.f0 import yin_f0
    from serenade_tpu.ops.world import band_aperiodicity

    x = _harmonic(noise=0.02, seed=3)
    x[: SR // 10] = 0.0  # leading silence exercises the unvoiced branch
    f0, _ = yin_f0(jnp.asarray(x), fs=SR)
    f0 = np.asarray(f0)
    bap_j = np.asarray(band_aperiodicity(jnp.asarray(x), jnp.asarray(f0),
                                         fs=SR))
    bap_n = band_aperiodicity_native(x, f0, fs=SR)
    assert bap_n.shape == bap_j.shape
    np.testing.assert_allclose(bap_n, bap_j, atol=0.25)
    # unvoiced frames fully aperiodic (0 dB) in both
    uv = f0 <= 0
    assert np.all(bap_n[uv] == 0.0)


def test_world_mcep_bap_native_backend_matches_jax():
    """The stage-9 aux-feature chain through the native analysis backend
    agrees with the jitted JAX chain (the CPU-only-host execution path of
    bin/ssc_postprocessing.py --analysis-backend native)."""
    from serenade_tpu.ops.f0 import yin_f0
    from serenade_tpu.sifigan.features import world_mcep_bap

    x = _harmonic(noise=0.01, seed=5)
    f0, _ = yin_f0(jnp.asarray(x), fs=SR)
    f0 = np.asarray(f0)
    mcep_j, bap_j, _ = world_mcep_bap(x, f0, SR, 5.0, 39)
    mcep_n, bap_n, _ = world_mcep_bap(x, f0, SR, 5.0, 39,
                                      analysis_backend="native")
    assert mcep_n.shape == mcep_j.shape and bap_n.shape == bap_j.shape
    np.testing.assert_allclose(mcep_n[:, 1:], mcep_j[:, 1:], atol=0.05)
    np.testing.assert_allclose(bap_n, bap_j, atol=0.25)


def test_native_analysis_rejects_out_of_range_frames():
    """f0 tracks longer than the audio supports fail loudly instead of
    reading past the heap (the JAX twins clamp gathers; the C++ cannot)."""
    from serenade_tpu.native import band_aperiodicity_native, cheaptrick_native

    x = _harmonic(seconds=0.2)
    n_frames_bad = len(x) // 120 + 10  # 5 ms hop at 24 kHz
    f0 = np.full(n_frames_bad, 220.0, np.float32)
    with pytest.raises(RuntimeError):
        cheaptrick_native(x, f0, fs=SR)
    with pytest.raises(RuntimeError):
        band_aperiodicity_native(x, f0, fs=SR)


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
