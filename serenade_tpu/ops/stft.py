"""On-device STFT as framing + DFT matmul.

The reference computes STFTs on CPU through librosa (preprocess.py:141-203)
and through nnAudio CUDA kernels in the MIDI frontend.  On TPU the natural
formulation is: reflect-pad → gather frames → (window ⊙ frame) @ DFT basis —
two dense matmuls that map straight onto the MXU, with no FFT butterfly
(fft_size is 512/2048 here; the O(N²) matmul is faster than a poorly-tiled
FFT at these sizes and fuses with the downstream mel projection).

Semantics match librosa.stft(center=True, pad_mode="reflect") with a
periodic Hann window zero-padded to fft_size.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_basis(fft_size: int):
    """Real/imag DFT analysis basis, shape (fft_size, fft_size//2+1) each."""
    n = np.arange(fft_size)[:, None]
    k = np.arange(fft_size // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / fft_size
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, fft_size: int):
    """Periodic Hann of ``win_length`` centered in ``fft_size`` zeros
    (librosa window handling)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    pad = (fft_size - win_length) // 2
    out = np.zeros(fft_size, np.float32)
    out[pad:pad + win_length] = w
    return out


def frame_signal(audio, fft_size: int, hop_size: int, center: bool = True):
    """audio (T,) -> frames (n_frames, fft_size); centered reflect padding."""
    if center:
        audio = jnp.pad(audio, (fft_size // 2, fft_size // 2), mode="reflect")
    n_frames = 1 + (audio.shape[0] - fft_size) // hop_size
    idx = (
        jnp.arange(n_frames)[:, None] * hop_size + jnp.arange(fft_size)[None, :]
    )
    return audio[idx]


def stft_power(audio, fft_size: int, hop_size: int, win_length: int | None = None,
               center: bool = True):
    """Power spectrogram |STFT|^2, shape (n_frames, fft_size//2 + 1)."""
    win_length = win_length or fft_size
    frames = frame_signal(audio, fft_size, hop_size, center)
    window = jnp.asarray(hann_window(win_length, fft_size))
    cos_b, sin_b = _dft_basis(fft_size)
    fw = frames * window
    re = fw @ jnp.asarray(cos_b)
    im = fw @ jnp.asarray(sin_b)
    return re * re + im * im


def stft_magnitude(audio, fft_size: int, hop_size: int,
                   win_length: int | None = None, center: bool = True):
    return jnp.sqrt(stft_power(audio, fft_size, hop_size, win_length, center)
                    + 1e-30)
