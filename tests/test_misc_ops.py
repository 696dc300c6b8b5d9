"""Unit tests for F0 statistics/transposition and sequence packing ops."""

import numpy as np
import jax.numpy as jnp

from serenade_tpu.ops.f0_stats import (
    C4_HZ,
    F0Statistics,
    cent_to_hz_c4,
    hz_to_cent_c4,
    linear_midi_shift,
)
from serenade_tpu.ops.sequence import pack_pair_time, unpack_suffix_time
from serenade_tpu.utils.types import int_or_none, str2bool


def test_cent_conversions_roundtrip():
    hz = np.array([0.0, 110.0, C4_HZ, 440.0, 880.0])
    cents = hz_to_cent_c4(hz)
    assert cents[0] == 0.0  # unvoiced stays zero
    assert abs(cents[2] - 4800.0) < 1e-9  # C4 anchor
    np.testing.assert_allclose(cent_to_hz_c4(cents), hz, rtol=1e-12)


def test_f0_statistics_estimate_convert():
    stats = F0Statistics()
    rng = np.random.default_rng(0)
    wobble = np.exp(0.05 * rng.standard_normal(50))
    f0_a = np.concatenate([np.zeros(10), 200.0 * wobble])
    f0_b = np.concatenate([np.zeros(5), 400.0 * wobble])
    sa = stats.estimate([f0_a])
    sb = stats.estimate([f0_b])
    assert abs(np.exp(sa[0]) - 200.0) < 5.0
    converted = stats.convert(f0_a, sa, sb)
    voiced = converted[f0_a > 0]
    assert abs(np.median(voiced) - 400.0) < 5.0
    assert (converted[f0_a == 0] == 0).all()


def test_linear_midi_shift_up_and_down():
    src = np.concatenate([np.zeros(8), np.full(60, 220.0)])
    ref_up = np.full(60, 330.0)
    shifted = linear_midi_shift(src, ref_up)
    voiced = shifted[src > 0]
    # up-shift: delta ~ +702 cents scaled 1.4 -> ~+1000 cents rounded to
    # whole semitones -> factor 2^(10/12)
    assert np.median(voiced) > 220.0 * 1.5
    assert (shifted[src == 0] == 0).all()
    # original array untouched (the reference mutates; we don't)
    assert np.median(src[src > 0]) == 220.0

    ref_down = np.full(60, 146.8)
    shifted_down = linear_midi_shift(src, ref_down)
    v = shifted_down[src > 0]
    assert np.median(v) < 220.0  # down-shift scaled 5/7


def test_pack_unpack_pair_time():
    b, tr, ts, c = 2, 6, 8, 3
    ref = jnp.arange(b * tr * c, dtype=jnp.float32).reshape(b, tr, c)
    src = -jnp.arange(b * ts * c, dtype=jnp.float32).reshape(b, ts, c)
    ref_len = jnp.array([6, 4])
    src_len = jnp.array([8, 5])
    packed, total = pack_pair_time(ref, ref_len, src, src_len)
    assert packed.shape == (b, tr + ts, c)
    assert total.tolist() == [14, 9]
    # sample 1: ref prefix of 4 then the full src block at offset 4
    np.testing.assert_array_equal(np.asarray(packed[1, :4]),
                                  np.asarray(ref[1, :4]))
    np.testing.assert_array_equal(np.asarray(packed[1, 4:4 + ts]),
                                  np.asarray(src[1]))
    # unpack returns exactly the src window
    got = unpack_suffix_time(packed, ref_len, ts)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(src[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(src[1]))


def test_cli_type_coercion():
    assert str2bool("true") and not str2bool("0")
    assert int_or_none("none") is None and int_or_none("7") == 7
