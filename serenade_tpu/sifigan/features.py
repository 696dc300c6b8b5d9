"""SiFiGAN input-signal features: sine excitation + dense dilation factors.

Counterparts of the external ``sifigan.utils.features`` the reference
imports (ssc_postprocessing.py:6-11,105-111,200-222): a sine source signal
generated from continuous F0 by phase accumulation, and per-level
"dense dilation factors" for the pitch-dependent (quasi-periodic) convs.

Dilation derivation: at network level *i* the temporal rate is
``r_i = fs * cumprod(upsample_scales)[i] / prod(upsample_scales)``; a
pitch-dependent conv with ``dense_factor`` taps per pitch cycle needs
dilation ``d_i(t) = r_i / (f0(t) * dense_factor_i)`` (level-native
samples), floored at 1.  Factors are computed at frame rate and repeated
``cumprod[i]`` times to each level's length, exactly the layout the
generator consumes (ssc_postprocessing.py:200-211).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np


def dilated_factor(cf0: np.ndarray, level_rate: float,
                   dense_factor: float) -> np.ndarray:
    """Per-frame dilation (level-native samples); cf0 (T,) or (T,1) > 0."""
    cf0 = np.asarray(cf0, np.float64).reshape(-1)
    safe = np.maximum(cf0, 1.0)
    return np.maximum(level_rate / (safe * dense_factor), 1.0)


def dense_factors_per_level(
    cf0: np.ndarray,
    fs: int,
    dense_factors: Sequence[float],
    upsample_scales: Sequence[int],
) -> List[np.ndarray]:
    """List of per-level dilation tracks, each repeated to level length."""
    cum = np.cumprod(upsample_scales)
    total = cum[-1]
    out = []
    for df, us in zip(dense_factors, cum):
        level_rate = fs * us / total
        d = dilated_factor(cf0, level_rate, df)
        out.append(np.repeat(d, us).astype(np.float32))
    return out


class SignalGenerator:
    """Sine/noise excitation at the waveform rate from frame-level F0."""

    def __init__(self, sample_rate: int = 24000, hop_size: int = 120,
                 sine_amp: float = 0.1, noise_amp: float = 0.003,
                 signal_types: Sequence[str] = ("sine",), seed: int = 100):
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.sine_amp = sine_amp
        self.noise_amp = noise_amp
        self.signal_types = tuple(signal_types)
        self.rng = np.random.default_rng(seed)

    def __call__(self, f0: np.ndarray) -> np.ndarray:
        """f0: (T,) or (T,1) frame F0 -> (T*hop,) excitation signal."""
        f0 = np.asarray(f0, np.float64).reshape(-1)
        f0_up = np.repeat(f0, self.hop_size)
        n = len(f0_up)
        parts = []
        for kind in self.signal_types:
            if kind == "sine":
                phase = 2.0 * np.pi * np.cumsum(f0_up) / self.sample_rate
                sine = self.sine_amp * np.sin(phase)
                sine = np.where(f0_up > 0, sine, 0.0)
                sine = sine + self.noise_amp * self.rng.standard_normal(n)
                parts.append(sine)
            elif kind == "noise":
                parts.append(self.sine_amp / 3.0
                             * self.rng.standard_normal(n))
            elif kind == "uv":
                parts.append((f0_up > 0).astype(np.float64))
            else:
                raise ValueError(f"unknown signal type {kind!r}")
        return np.stack(parts, axis=-1).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _world_program(padded_len: int, n_frames_b: int, fs: int,
                   frame_period_ms: float, ap_backend: str):
    """One jitted CheapTrick+aperiodicity program per waveform length
    bucket.  Eager per-op dispatch of the analysis chain costs hundreds
    of device round trips per utterance on tunneled links AND
    re-specializes per exact length; bucketing + jit makes it one
    dispatch with one compile per bucket."""
    import jax

    from serenade_tpu.ops.world import band_aperiodicity, cheaptrick, d4c

    def run(wav, f0):
        sp = cheaptrick(wav, f0, fs=fs, frame_period_ms=frame_period_ms)
        ap_fn = d4c if ap_backend == "d4c" else band_aperiodicity
        return sp, ap_fn(wav, f0, fs=fs, frame_period_ms=frame_period_ms)

    return jax.jit(run)


def world_mcep_bap(wav, f0, fs: int, frame_period_ms: float, mcep_dim: int,
                  ap_backend: str = "bandap", analysis_backend: str = "jax"):
    """CheapTrick + aperiodicity analysis → ``(mcep, bap, sp)``.

    The SiFiGAN aux-feature contract, shared by stage-9 postprocessing
    (bin/ssc_postprocessing.py) and the vocoder trainer
    (trainers/vocoder_trainer.py) so training and synthesis conditioning
    cannot drift apart.  Runs as ONE bucket-padded jitted dispatch
    (per-frame analysis: padding frames are computed and discarded,
    true frames are unchanged).

    ``ap_backend``: 'bandap' (default — the autocorrelation estimator,
    calibrated to ~0.3 dB of true band noise ratios) or 'd4c' (WORLD's
    static-group-delay D4C, the reference's pyworld.d4c algorithm); see
    ops/world.py for the measured comparison.

    ``analysis_backend='native'`` runs the same CheapTrick + bandap
    algorithms through the C++ host library (serenade_tpu.native) —
    no JAX dispatch, for CPU-only hosts; cross-validated ≤0.1 dB LSD /
    ≤0.25 dB bap in tests/test_native.py.  Requires ap_backend='bandap'
    (there is no native D4C).
    """
    import jax.numpy as jnp

    from serenade_tpu.ops.sptk import ALPHA, sp2mc

    wav = np.asarray(wav, np.float32).reshape(-1)
    f0 = np.asarray(f0, np.float32).reshape(-1)
    t = f0.shape[0]
    if analysis_backend == "native":
        if ap_backend != "bandap":
            raise ValueError(
                "analysis_backend='native' supports ap_backend='bandap' only")
        from serenade_tpu.native import (band_aperiodicity_native,
                                         cheaptrick_native)

        sp = cheaptrick_native(wav, f0, fs=fs,
                               frame_period_ms=frame_period_ms)
        bap = band_aperiodicity_native(wav, f0, fs=fs,
                                       frame_period_ms=frame_period_ms)
        mcep = sp2mc(sp, order=mcep_dim, alpha=ALPHA[fs])
        return mcep, bap, sp
    hop = int(fs * frame_period_ms / 1000.0)
    bucket = 128 * hop
    padded = max(((len(wav) + bucket - 1) // bucket) * bucket, bucket)
    wav_b = np.pad(wav, (0, padded - len(wav)))
    t_b = 1 + padded // hop
    f0_b = np.pad(f0[:t_b], (0, max(0, t_b - t)))
    fn = _world_program(padded, t_b, fs, frame_period_ms, ap_backend)
    sp, bap = (np.asarray(a) for a in fn(jnp.asarray(wav_b),
                                         jnp.asarray(f0_b)))
    sp, bap = sp[:t], bap[:t]
    mcep = sp2mc(sp, order=mcep_dim, alpha=ALPHA[fs])
    return mcep, bap, sp
