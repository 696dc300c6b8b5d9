"""Native C++ DSP library vs the JAX/numpy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.native import freqt_native, native_available, yin_f0_native
from serenade_tpu.ops.f0 import yin_f0
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
