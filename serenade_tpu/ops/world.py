"""WORLD-class spectral analysis (CheapTrick envelope, D4C-class band
aperiodicity), batched for TPU.

The reference reaches these through pyworld's C++ (ssc_postprocessing.py:
147-168, utils/signal.py:108): a sequential per-frame loop on CPU.  Here
every frame evaluates in parallel: pitch-adaptive windows become masked
fixed-size windows (max length = 3*fs/f0_floor), and the per-frame FFTs,
frequency smoothing, and liftering are batched matrix/FFT ops.

CheapTrick follows Morise 2015: 3*T0 Hanning window, DC-mean removal,
rectangular smoothing of width 2f0/3, and cepstral liftering
sin(pi f0 q)/(pi f0 q) * ((1-2q1) + 2q1 cos(2 pi f0 q)) with q1 = -0.15.
Unvoiced frames use the WORLD default F0 (500 Hz window).

Aperiodicity is D4C-class, not a line-by-line D4C: per coarse band
(3 kHz spacing, like WORLD's CodeAperiodicity layout), the aperiodic ratio
is 1 - r(T0)/r_w(T0): the band's normalized autocorrelation at the local
pitch period, corrected by the analysis window's own autocorrelation decay.
Both are evaluated in the frequency domain (Wiener-Khinchin with the exact
fractional lag in the phase term, half-weighted DC/Nyquist bins), which
avoids the interpolation lowpass and window-decay biases of a time-domain
lag gather.  Measured accuracy on harmonic+noise signals with known band
noise ratios: within ~0.5 dB over a ∈ [0.01, 0.3], F0 ∈ [80, 300] Hz
(tests/test_f0_world_quantified.py).  It feeds the same `bap` conditioning
slot of SiFiGAN (3 bands at 24 kHz).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_F0 = 500.0
Q1 = -0.15


def _fft_size_for(fs: int, f0_floor: float) -> int:
    return 1 << math.ceil(math.log2(3.0 * fs / f0_floor + 1.0))


@functools.partial(
    jax.jit, static_argnames=("fs", "f0_floor", "frame_period_ms", "fft_size")
)
def cheaptrick(
    x,
    f0,
    fs: int = 24000,
    f0_floor: float = 71.0,
    frame_period_ms: float = 5.0,
    fft_size: int | None = None,
):
    """Spectral envelope |H(w)|^2, shape (T, fft_size//2+1).

    Args:
        x: (N,) waveform.
        f0: (T,) per-frame F0 in Hz (0 = unvoiced).
    """
    if fft_size is None:
        fft_size = _fft_size_for(fs, f0_floor)
    hop = int(fs * frame_period_ms / 1000.0)
    T = f0.shape[0]
    f0_safe = jnp.where(f0 <= 0, DEFAULT_F0, f0)
    f0_safe = jnp.maximum(f0_safe, f0_floor)

    max_half = fft_size // 2
    # gather a fixed window of samples around each frame center
    centers = jnp.arange(T) * hop
    offs = jnp.arange(-max_half, max_half)
    pad = max_half + 1
    xp = jnp.pad(jnp.asarray(x, jnp.float32), (pad, pad))
    idx = centers[:, None] + offs[None, :] + pad
    frames = xp[idx]  # (T, fft_size)

    # pitch-synchronous Hanning of length 3*T0, masked inside the buffer
    half_len = jnp.rint(1.5 * fs / f0_safe).astype(jnp.int32)  # (T,)
    pos = jnp.abs(offs)[None, :]
    in_win = (pos <= half_len[:, None]).astype(jnp.float32)
    win = 0.5 + 0.5 * jnp.cos(
        jnp.pi * offs[None, :] / jnp.maximum(half_len[:, None], 1)
    )
    win = win * in_win

    # DC removal: subtract window-weighted mean (WORLD GetWindowedWaveform)
    wsum = jnp.sum(win, axis=1, keepdims=True)
    mean = jnp.sum(frames * win, axis=1, keepdims=True) / jnp.maximum(wsum, 1e-9)
    windowed = (frames - mean) * win

    power = jnp.abs(jnp.fft.rfft(windowed, fft_size)) ** 2  # (T, F)
    power = power + 1e-12

    bin_hz = fs / fft_size
    F = fft_size // 2 + 1

    # DC correction (WORLD CheapTrick): bins below f0 have no harmonic
    # support and bias the envelope low; add the spectrum mirrored around
    # f0 (P(f) += P(f0 - f) for f < f0) before smoothing
    k = jnp.arange(F, dtype=jnp.float32)
    f0_bins = f0_safe[:, None] / bin_hz  # (T, 1)
    mirror = f0_bins - k[None, :]  # fractional replica bin per (frame, bin)
    lo = jnp.clip(jnp.floor(mirror), 0.0, F - 2.0)
    frac = jnp.clip(mirror - lo, 0.0, 1.0)
    lo_i = lo.astype(jnp.int32)
    p_lo = jnp.take_along_axis(power, lo_i, axis=1)
    p_hi = jnp.take_along_axis(power, lo_i + 1, axis=1)
    replica = (1.0 - frac) * p_lo + frac * p_hi
    power = jnp.where(k[None, :] < f0_bins, power + replica, power)
    width_bins = (2.0 * f0_safe / 3.0) / bin_hz  # (T,)
    # smoothing via cumulative sum with fractional-width box filter
    csum = jnp.concatenate(
        [jnp.zeros((T, 1)), jnp.cumsum(power, axis=1)], axis=1
    )

    def smooth_row(c_row, p_row, w):
        k = jnp.arange(F, dtype=jnp.float32)
        lo = jnp.clip(k - w / 2.0, 0.0, F - 1.0)
        hi = jnp.clip(k + w / 2.0, 0.0, F - 1.0)
        lo_i = jnp.floor(lo).astype(jnp.int32)
        hi_i = jnp.floor(hi).astype(jnp.int32)
        # integral of p over [lo, hi] with linear interp at the edges
        area = (
            c_row[hi_i] - c_row[lo_i]
            + (hi - hi_i) * p_row[jnp.minimum(hi_i, F - 1)]
            - (lo - lo_i) * p_row[jnp.minimum(lo_i, F - 1)]
        )
        return area / jnp.maximum(hi - lo, 1e-6)

    smoothed = jax.vmap(smooth_row)(csum, power, width_bins)

    # cepstral liftering: log spectrum -> quefrency -> lifter -> back
    log_s = jnp.log(jnp.maximum(smoothed, 1e-12))
    ceps = jnp.fft.irfft(log_s, n=fft_size, axis=1)  # (T, fft), symmetric
    q_idx = jnp.arange(fft_size)
    q = jnp.minimum(q_idx, fft_size - q_idx) / fs  # symmetric quefrency (s)
    f0q = f0_safe[:, None] * q[None, :]
    lifter = jnp.where(
        f0q == 0, 1.0, jnp.sin(jnp.pi * f0q) / jnp.maximum(jnp.pi * f0q, 1e-9)
    )
    comp = (1.0 - 2.0 * Q1) + 2.0 * Q1 * jnp.cos(2.0 * jnp.pi * f0q)
    log_env = jnp.fft.rfft(ceps * lifter * comp, axis=1).real  # (T, F)
    return jnp.exp(log_env)


def _band_edges(fs: int) -> np.ndarray:
    """Coarse aperiodicity center frequencies: 3 kHz spacing, capped like
    WORLD's CodeAperiodicity (floor(min(15000, fs/2-3000)/3000) bands —
    3 bands at 24 kHz, matching SiFiGAN's bap conditioning width)."""
    n_bands = int(min(15000.0, fs / 2.0 - 3000.0) // 3000.0)
    return np.arange(1, n_bands + 1) * 3000.0


@functools.partial(jax.jit, static_argnames=("fs", "frame_period_ms"))
def band_aperiodicity(
    x,
    f0,
    fs: int = 24000,
    frame_period_ms: float = 5.0,
):
    """Coarse band aperiodicity in dB, shape (T, n_bands) with bands at
    3 kHz spacing (the `code_aperiodicity` output layout of WORLD)."""
    hop = int(fs * frame_period_ms / 1000.0)
    T = f0.shape[0]
    f0_safe = jnp.maximum(jnp.where(f0 <= 0, DEFAULT_F0, f0), 40.0)

    win_len = 1024
    nfft = 2 * win_len  # zero-padded: linear (not circular) autocorrelation
    centers = jnp.arange(T) * hop
    offs = jnp.arange(win_len)
    xp = jnp.pad(jnp.asarray(x, jnp.float32), (win_len // 2, win_len))
    frames = xp[centers[:, None] + offs[None, :]]
    window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(win_len) / win_len)
    power = jnp.abs(jnp.fft.rfft(frames * window, nfft)) ** 2  # (T, F)
    freqs = jnp.fft.rfftfreq(nfft, 1.0 / fs)
    # half-spectrum sums must half-weight DC/Nyquist to equal the full
    # (time-domain) autocorrelation — the window is DC-dominant, so this
    # matters several dB
    wgt = jnp.ones(freqs.shape[0]).at[0].set(0.5).at[-1].set(0.5)
    power = power * wgt[None, :]

    # Wiener-Khinchin: r(tau) = sum_f P(f) cos(2 pi f tau) with the EXACT
    # fractional pitch period in the phase (no lag interpolation lowpass)
    tau = 1.0 / f0_safe  # seconds, (T,)
    cosm = jnp.cos(2.0 * jnp.pi * freqs[None, :] * tau[:, None])  # (T, F)

    # the window's own autocorrelation decay at tau (same formula)
    w2 = jnp.abs(jnp.fft.rfft(window, nfft)) ** 2 * wgt
    r_w = jnp.sum(w2[None, :] * cosm, axis=1) / jnp.sum(w2)  # (T,)

    edges = _band_edges(fs)
    los = np.concatenate([[0.0], edges[:-1]])
    cols = []
    for lo, hi in zip(los, edges):
        mask = ((freqs >= lo) & (freqs < hi)).astype(jnp.float32)[None, :]
        energy = jnp.sum(power * mask, axis=1)
        r = jnp.sum(power * mask * cosm, axis=1)
        rn = r / jnp.maximum(energy, 1e-12) / jnp.maximum(r_w, 1e-3)
        ap = jnp.clip(1.0 - rn, 1e-6, 1.0)
        cols.append(10.0 * jnp.log10(ap))
    bap = jnp.stack(cols, axis=1)
    # unvoiced frames: fully aperiodic (0 dB)
    return jnp.where((f0 <= 0)[:, None], 0.0, bap)


def aperiodicity_spectrum(bap, fs: int, fft_size: int):
    """Expand coarse band aperiodicity (dB) to a full (T, fft//2+1) linear
    aperiodicity spectrum by frequency interpolation (decode direction of
    WORLD's coded aperiodicity)."""
    bap = np.asarray(bap)
    edges = _band_edges(fs)
    freqs = np.fft.rfftfreq(fft_size, 1.0 / fs)
    pts_f = np.concatenate([[0.0], edges, [fs / 2.0]])
    out = np.empty((bap.shape[0], len(freqs)))
    for t in range(bap.shape[0]):
        pts_v = np.concatenate([[bap[t, 0]], bap[t], [bap[t, -1]]])
        out[t] = np.interp(freqs, pts_f, pts_v)
    return np.power(10.0, out / 10.0)
