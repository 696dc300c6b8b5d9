"""Log-mel filterbank and perceptual loudness, on-device.

TPU-native counterparts of reference bin/preprocess.py:141-203
(`logmelfilterbank`, librosa-backed) and :126-138 (`loudness_extract`,
A-weighted mean amplitude).  Filterbank numerics follow librosa defaults:
Slaney-style mel scale (linear < 1 kHz, log above) with Slaney area
normalization; loudness follows the librosa pipeline
perceptual_weighting → db_to_amplitude → log-mean exactly (including the
top_db=80 clip inside power_to_db).

Everything is jnp + matmuls: STFT @ mel_basis fuses into one MXU pipeline.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from serenade_tpu.ops.stft import stft_magnitude, stft_power

# ---------------------------------------------------------------------------
# mel filterbank (Slaney scale + norm, librosa-compatible)
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@functools.lru_cache(maxsize=None)
def mel_filterbank(sr: int, fft_size: int, num_mels: int, fmin: float,
                   fmax: float) -> np.ndarray:
    """(fft_size//2+1, num_mels) triangular filters, Slaney-normalized."""
    n_bins = fft_size // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2:num_mels + 2] - hz_pts[:num_mels])
    weights = weights * enorm[:, None]
    return weights.T.astype(np.float32)  # (n_bins, num_mels)


def logmelfilterbank(
    audio,
    sampling_rate: int,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: int | None = None,
    num_mels: int = 80,
    fmin: float | None = None,
    fmax: float | None = None,
    eps: float = 1e-10,
    log_base: float | None = 10.0,
):
    """Log-mel features (n_frames, num_mels) from a mono waveform.

    Mirrors reference preprocess.py:141-203: amplitude (not power)
    spectrogram @ mel basis, floored at eps, log10 by default.
    """
    fmin = 0.0 if fmin is None else float(fmin)
    fmax = sampling_rate / 2.0 if fmax is None else float(fmax)
    spc = stft_magnitude(audio, fft_size, hop_size, win_length)
    basis = jnp.asarray(
        mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax)
    )
    mel = jnp.maximum(eps, spc @ basis)
    if log_base is None:
        return jnp.log(mel)
    if log_base == 10.0:
        return jnp.log10(mel)
    if log_base == 2.0:
        return jnp.log2(mel)
    raise ValueError(f"unsupported log base {log_base}")


# ---------------------------------------------------------------------------
# A-weighted loudness
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def a_weighting(sr: int, fft_size: int, min_db: float = -80.0) -> np.ndarray:
    """IEC-61672 A-weighting curve in dB per rFFT bin (librosa semantics)."""
    f = np.linspace(0.0, sr / 2.0, fft_size // 2 + 1)
    f_sq = f**2
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2
    num = const[0] * f_sq**2
    den = (
        (f_sq + const[0])
        * (f_sq + const[1])
        * np.sqrt((f_sq + const[2]) * (f_sq + const[3]))
    )
    weights = 2.0 + 20.0 * np.log10(np.maximum(num / np.maximum(den, 1e-30), 1e-30))
    return np.maximum(weights, min_db).astype(np.float32)


def loudness_extract(audio, sampling_rate: int, hop_length: int,
                     fft_size: int = 2048):
    """Frame-level log A-weighted loudness (n_frames,).

    Reference pipeline (preprocess.py:126-138): power STFT →
    perceptual_weighting (A-weighting dB + power_to_db with its top_db=80
    clamp) → db_to_amplitude → log(mean + 1e-5).
    """
    power = stft_power(audio, fft_size, hop_length)  # (n_frames, bins)
    power_db = 10.0 * jnp.log10(jnp.maximum(power, 1e-10))
    power_db = jnp.maximum(power_db, jnp.max(power_db) - 80.0)  # top_db clip
    weighted_db = power_db + jnp.asarray(a_weighting(sampling_rate, fft_size))
    amplitude = jnp.power(10.0, 0.5 * weighted_db)
    return jnp.log(jnp.mean(amplitude, axis=1) + 1e-5)
