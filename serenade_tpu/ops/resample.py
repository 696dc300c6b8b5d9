"""Device-side polyphase resampling (scipy.signal.resample_poly parity).

The serving raw-audio path needs the 24 kHz -> 16 kHz resample feeding
ContentVec to happen ON DEVICE: the host implementation
(`utils.audio.resample`) forces a second waveform upload per request
(f32 16 kHz alongside the 24 kHz signal-program input), which on
tunneled/remote-device links is pure transfer tax.  Reference context:
the upstream resamples on host with librosa/scipy before its GPU HuBERT
forward (serenade/bin/preprocess.py:495-503).

Taps are computed once on host exactly as scipy.signal.resample_poly
does (kaiser-5.0-windowed sinc, half length ``10*max(up, down)``,
scaled by ``up``); the device op is one ``conv_general_dilated`` with
``lhs_dilation=up`` (zero-stuffing) and ``window_strides=down`` —
upfirdn as a single XLA convolution.  Parity vs scipy is exact to f32
rounding (tests/test_misc_ops.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def resample_poly_taps(up: int, down: int) -> np.ndarray:
    """The FIR scipy.signal.resample_poly builds for (up, down)."""
    from scipy.signal import firwin

    g = math.gcd(up, down)
    up, down = up // g, down // g
    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
    return (h * up).astype(np.float64)


def resample_device(x, up: int, down: int):
    """Batched device resample: (B, n) f32/int16 -> (B, ceil(n*up/down)).

    int16 input is dequantized on device (the int16 wire format halves
    the upload vs f32; PCM16 sources lose nothing).  Matches
    ``scipy.signal.resample_poly(x, up, down)`` per row.
    """
    import jax
    import jax.numpy as jnp

    g = math.gcd(up, down)
    up, down = up // g, down // g

    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32) / 32768.0  # matches read_wav's PCM16 decode
    x = x.astype(jnp.float32)
    if up == down:
        # identity ratio: scipy.resample_poly returns the input unchanged
        # (and firwin rejects cutoff == Nyquist, so no taps exist)
        return x
    h = resample_poly_taps(up, down)
    half_len = (len(h) - 1) // 2
    n = x.shape[-1]
    target = (n * up + down - 1) // down  # ceil, scipy's output length
    # pad_r sized so the strided conv emits at least ``target`` outputs:
    # the last output reads zero-stuffed position (target-1)*down, which
    # can sit up to up-1 past the last real sample's position (n-1)*up,
    # so the right pad needs half_len + (up - 1) + 1 zero-stuffed slots
    # beyond it (half_len + down was short whenever up > down + 1 and
    # (n-1)*up mod down landed high — e.g. (160,147) at n=34 dropped the
    # final sample)
    pad_r = half_len + up + down
    y = jax.lax.conv_general_dilated(
        x[:, None, :],
        jnp.asarray(h, jnp.float32)[None, None, :],
        window_strides=(down,),
        padding=[(half_len, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[:, 0, :target]
