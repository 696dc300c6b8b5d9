"""Griffin-Lim mel inversion as a checkpoint-free vocoder backend.

The reference has no equivalent: its mel->wav path always goes through a
pretrained HiFiGAN (vocoder/vocoder.py:51-62).  For framework validation
runs where no trained vocoder exists (synthetic corpora, golden e2e runs)
a deterministic inversion is needed so objective metrics (MCD, log-F0
RMSE — bin/evaluate.py) measure the CONVERSION quality rather than an
untrained generator's noise.

TPU-native formulation: the analysis/synthesis transforms are the same
framing + DFT matmuls as ops/stft.py (MXU-friendly, no FFT butterfly at
fft_size 512); overlap-add is a scatter-add; the Griffin-Lim phase
iterations run under ``lax.fori_loop`` in one jitted program.

Selected through the vocoder config yaml with ``generator_type:
GriffinLim`` (see ``load_vocoder``); plugs into the ``Vocoder`` facade
with empty params, so decode/decode_batch/serving paths work unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from serenade_tpu.ops.mel import mel_filterbank
from serenade_tpu.ops.stft import _dft_basis, hann_window


@functools.lru_cache(maxsize=None)
def _synthesis_basis(fft_size: int):
    """Inverse rDFT basis: (fft_size//2+1, fft_size) for re and im.

    x[n] = sum_k w_k (re_k cos(2πkn/N) - im_k sin(2πkn/N)) / N with
    w_k = 2 except DC/Nyquist — the standard irfft as two matmuls.
    """
    n_bins = fft_size // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(fft_size)[None, :]
    ang = 2.0 * np.pi * k * n / fft_size
    w = np.full((n_bins, 1), 2.0)
    w[0, 0] = 1.0
    if fft_size % 2 == 0:
        w[-1, 0] = 1.0
    cos_b = (w * np.cos(ang) / fft_size).astype(np.float32)
    sin_b = (w * np.sin(ang) / fft_size).astype(np.float32)
    return cos_b, sin_b


def _stft(x, window, cos_b, sin_b, fft_size, hop):
    pad = fft_size // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (xp.shape[0] - fft_size) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(fft_size)[None, :])
    fw = xp[idx] * window
    return fw @ cos_b, fw @ sin_b


def _istft(re, im, window, icos_b, isin_b, fft_size, hop, out_len):
    """Overlap-add inverse STFT with squared-window normalization
    (librosa.istft semantics, center=True)."""
    frames = re @ icos_b - im @ isin_b  # (n_frames, fft_size)
    frames = frames * window
    n_frames = frames.shape[0]
    total = (n_frames - 1) * hop + fft_size
    offs = (jnp.arange(n_frames)[:, None] * hop
            + jnp.arange(fft_size)[None, :])
    y = jnp.zeros(total, frames.dtype).at[offs.reshape(-1)].add(
        frames.reshape(-1))
    wsq = jnp.zeros(total, frames.dtype).at[offs.reshape(-1)].add(
        jnp.broadcast_to(window * window, (n_frames, fft_size)).reshape(-1))
    y = y / jnp.maximum(wsq, 1e-8)
    pad = fft_size // 2
    return y[pad:pad + out_len]


class GriffinLimSynth:
    """Mel (log, normalized-out) -> waveform via pinv-mel + Griffin-Lim.

    API-compatible with the slice of ``HiFiGANGenerator`` the ``Vocoder``
    facade uses: ``apply(params, c)`` maps (B, T, num_mels) log-mel to
    (B, T * hop_size, 1) waveforms; ``params`` is an empty dict.
    """

    def __init__(self, sampling_rate: int = 24000, fft_size: int = 512,
                 hop_size: int = 240, win_length: int = 480,
                 num_mels: int = 80, fmin: float = 63.0,
                 fmax: float = 12000.0, n_iter: int = 32,
                 log_base: float = 10.0, power: float = 1.2):
        self.sampling_rate = sampling_rate
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = win_length
        self.num_mels = num_mels
        self.n_iter = n_iter
        self.log_base = log_base
        # mild magnitude exaggeration before inversion sharpens harmonics
        # against GL's phase smearing (common librosa.feature.inverse trick)
        self.power = power
        basis = mel_filterbank(sampling_rate, fft_size, num_mels,
                               float(fmin), float(fmax))  # (bins, mels)
        self._mel_pinv = np.maximum(
            np.linalg.pinv(basis.astype(np.float64)), 0.0
        ).astype(np.float32)  # (mels, bins)

    def _invert_one(self, mel_log):
        """(T, mels) log-mel -> (T * hop,) waveform; jit-traceable."""
        fft, hop = self.fft_size, self.hop_size
        window = jnp.asarray(hann_window(self.win_length, fft))
        cos_b, sin_b = (jnp.asarray(b) for b in _dft_basis(fft))
        icos_b, isin_b = (jnp.asarray(b) for b in _synthesis_basis(fft))

        if self.log_base == 10.0:
            amp_mel = jnp.power(10.0, mel_log)
        elif self.log_base == 2.0:
            amp_mel = jnp.power(2.0, mel_log)
        else:
            amp_mel = jnp.exp(mel_log)
        mag = jnp.maximum(amp_mel @ jnp.asarray(self._mel_pinv), 1e-10)
        mag = jnp.power(mag, self.power)

        out_len = mel_log.shape[0] * hop
        # zero-phase init (deterministic; random phases converge similarly)
        re0, im0 = mag, jnp.zeros_like(mag)

        def body(_, carry):
            re, im = carry
            y = _istft(re, im, window, icos_b, isin_b, fft, hop, out_len)
            re2, im2 = _stft(y, window, cos_b, sin_b, fft, hop)
            re2 = re2[: mag.shape[0]]
            im2 = im2[: mag.shape[0]]
            norm = jnp.sqrt(re2 * re2 + im2 * im2) + 1e-10
            return mag * re2 / norm, mag * im2 / norm

        re, im = jax.lax.fori_loop(0, self.n_iter, body, (re0, im0))
        y = _istft(re, im, window, icos_b, isin_b, fft, hop, out_len)
        peak = jnp.max(jnp.abs(y))
        return y * (0.95 / jnp.maximum(peak, 0.95))

    def apply(self, params, c):
        """(B, T, mels) -> (B, T*hop, 1); ``params`` ignored (stateless)."""
        del params
        y = jax.vmap(self._invert_one)(c)
        return y[..., None]
