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


def test_resample_device_matches_scipy():
    """ops/resample.py: the one-conv upfirdn == scipy.signal.resample_poly
    to f32 rounding, for the serving ratios and awkward lengths."""
    from scipy.signal import resample_poly

    from serenade_tpu.ops.resample import resample_device

    rng = np.random.default_rng(0)
    for up, down in [(2, 3), (3, 2), (1, 3), (160, 147), (7, 2)]:
        # n=34 at (160,147): (n-1)*up mod down == 135 — the high-phase
        # final sample a short right-pad silently drops
        for n in (34, 1000, 48000, 48001, 48000 * 2 + 7):
            x = rng.normal(size=(2, n)).astype(np.float32) * 0.3
            want = np.stack([resample_poly(row, up, down) for row in x])
            got = np.asarray(resample_device(jnp.asarray(x), up, down))
            assert got.shape == want.shape, (up, down, n)
            np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)


def test_resample_device_identity_ratio():
    """up == down returns the input unchanged (scipy resample_poly
    semantics; a naive tap build would ask firwin for cutoff == Nyquist
    and crash) — e.g. a client whose source is already at the target
    rate."""
    from serenade_tpu.ops.resample import resample_device

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 1000)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(resample_device(jnp.asarray(x), 3, 3)), x)
    pcm = rng.integers(-32768, 32768, size=(1, 100), dtype=np.int16)
    got = np.asarray(resample_device(jnp.asarray(pcm), 1, 1))
    np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0)


def test_resample_device_int16_wire_lossless_for_pcm16():
    """int16 wire + /32768 dequant: PCM16-sourced audio (read_wav decode)
    resamples identically to its f32 representation."""
    from serenade_tpu.ops.resample import resample_device

    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32768, size=(1, 48000), dtype=np.int16)
    as_f32 = pcm.astype(np.float32) / 32768.0  # read_wav convention
    # the serving quantizer must reproduce the original ints exactly
    requant = np.clip(np.round(as_f32 * 32768.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(requant, pcm)
    a = np.asarray(resample_device(jnp.asarray(pcm), 2, 3))
    b = np.asarray(resample_device(jnp.asarray(as_f32), 2, 3))
    np.testing.assert_array_equal(a, b)


def test_bucket24_commutes_with_host_bucketing():
    """The 24 kHz device path's effective 16 kHz input — resample of the
    48000-padded signal, zeroed past each row's true 16 kHz length as
    make_content_fn._infer24 does — equals the host path's 32000-padded
    resample exactly (to f32 rounding): the appended zeros match the
    FIR's implicit zero extension on [0, n16), and the mask removes the
    ring-out beyond it, so batch24 and host-resample+batch feed HuBERT
    identical inputs."""
    from scipy.signal import resample_poly

    from serenade_tpu.ops.resample import resample_device

    rng = np.random.default_rng(2)
    for n24 in (48000, 48000 + 1, 2 * 48000 - 301):
        x = rng.normal(size=n24).astype(np.float32) * 0.3
        pad24 = ((n24 + 47999) // 48000) * 48000
        dev16 = np.array(resample_device(
            jnp.asarray(np.pad(x, (0, pad24 - n24))[None]), 2, 3))[0]
        host = resample_poly(x, 2, 3).astype(np.float32)
        n16 = len(host)
        assert n16 == (n24 * 2 + 2) // 3  # _bucket24's frame-count basis
        dev16[n16:] = 0.0  # _infer24's tail mask
        pad16 = ((n16 + 31999) // 32000) * 32000
        host_b = np.pad(host, (0, pad16 - n16))
        assert dev16.shape == host_b.shape
        np.testing.assert_allclose(dev16, host_b, atol=2e-6, rtol=0)
