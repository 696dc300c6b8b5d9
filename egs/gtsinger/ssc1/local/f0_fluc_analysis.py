#!/usr/bin/env python3
"""F0-fluctuation analysis: the runnable counterpart of the reference's
scratch notebook (egs/gtsinger/ssc1/test_site.ipynb cells 0-3), which
prototyped the `_new` variant's F0-fluctuation feature: Harvest F0 →
normalize by the voice's max F0 → UnivariateSpline(s=10) smoothing →
residual / derivative fluctuation tracks, compared across style
renditions of the same song.

This script produces what the notebook produced — overlaid smoothed-F0
curves and fluctuation tracks for N wavs — through the framework's own
ops (the SAME `compute_f0_fluctuation` the preprocess-new CLI dumps as
`f0_fluc`, features.py), so the analysis can never drift from the
shipped feature.  Per wav it prints the residual's RMS and dominant
modulation rate (Hz), the two numbers that motivated the feature
(vibrato-heavy styles show a strong 4-7 Hz component).

Usage:
    python local/f0_fluc_analysis.py out.png a.wav [b.wav ...] \
        [--maxf0 440] [--smoothing 10] [--f0-backend harvest]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "..", ".."))


def analyze(wav_path: str, maxf0: float, smoothing: float,
            f0_backend: str, shiftms: float = 10.0):
    """Returns (t, f0_normed, f0_smooth, f0_fluc_residual, f0_fluc_deriv).

    Mirrors the notebook's get_audio_graph (test_site.ipynb cell 1):
    normalized F0, spline smoothing with the given factor, the smoothed
    track's frame-to-frame derivative — plus the residual form the
    framework actually ships (preprocess_new dumps f0_normed - spline).
    """
    from scipy.interpolate import UnivariateSpline

    import jax.numpy as jnp

    from serenade_tpu.features import compute_f0_fluctuation
    from serenade_tpu.ops.f0 import smooth_f0_median, yin_f0_viterbi
    from serenade_tpu.utils.audio import read_wav, to_mono

    audio, fs = read_wav(wav_path)
    audio = to_mono(np.asarray(audio, np.float32))

    if f0_backend == "harvest":
        from serenade_tpu.ops.harvest import harvest_f0

        f0, _ = harvest_f0(jnp.asarray(audio), fs=fs,
                           frame_period_ms=shiftms)
    else:
        f0, _ = yin_f0_viterbi(jnp.asarray(audio), fs=fs,
                               frame_period_ms=shiftms)
    f0 = np.asarray(smooth_f0_median(f0))

    t = np.arange(len(f0)) * shiftms / 1000.0
    f0_normed = np.asarray(f0, np.float64) / maxf0
    spline = UnivariateSpline(t, f0_normed, s=smoothing)
    f0_smooth = spline(t)

    # the shipped feature: spline residual (features.py, the
    # preprocess-new `f0_fluc` h5 key)
    residual = compute_f0_fluctuation(f0, maxf0, shiftms=shiftms)
    # the notebook's derivative variant (cell 1's f0_fluc)
    dt = shiftms / 1000.0
    deriv = np.concatenate([[0.0], np.diff(f0_smooth) / dt])
    return t, f0_normed, f0_smooth, residual, deriv


def dominant_rate(residual: np.ndarray, shiftms: float = 10.0) -> float:
    """Dominant modulation frequency (Hz) of the residual, 1-20 Hz band."""
    n = len(residual)
    if n < 16:
        return 0.0
    spec = np.abs(np.fft.rfft(residual - residual.mean()))
    freqs = np.fft.rfftfreq(n, d=shiftms / 1000.0)
    band = (freqs >= 1.0) & (freqs <= 20.0)
    if not band.any():
        return 0.0
    return float(freqs[band][np.argmax(spec[band])])


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("out_png")
    p.add_argument("wavs", nargs="+")
    p.add_argument("--maxf0", type=float, default=440.0,
                   help="normalization ceiling (the notebook's f0max)")
    p.add_argument("--smoothing", type=float, default=10.0,
                   help="UnivariateSpline smoothing factor s "
                        "(notebook cell 2: s=10)")
    p.add_argument("--f0-backend", default="harvest",
                   choices=("harvest", "viterbi"),
                   help="harvest matches the notebook (pyworld.harvest); "
                        "viterbi is the faster YIN-Viterbi")
    p.add_argument("--shiftms", type=float, default=10.0)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(12, 9), sharex=True)
    for wav in args.wavs:
        label = os.path.splitext(os.path.basename(wav))[0]
        t, f0n, f0s, res, der = analyze(
            wav, args.maxf0, args.smoothing, args.f0_backend, args.shiftms)
        rms = float(np.sqrt(np.mean(np.square(res))))
        rate = dominant_rate(res, args.shiftms)
        print(f"{wav}: frames={len(t)} residual_rms={rms:.5f} "
              f"dominant_rate_hz={rate:.2f}")
        axes[0].plot(t, f0n * args.maxf0, lw=1, alpha=0.6)
        axes[0].plot(t, f0s * args.maxf0, lw=2, label=label)
        axes[1].plot(t, res, lw=1, label=label)
        axes[2].plot(t, der, lw=1, label=label)
    axes[0].set_ylabel("F0 (Hz): raw + spline")
    axes[1].set_ylabel("fluc residual (shipped f0_fluc)")
    axes[2].set_ylabel("d(smoothed)/dt (notebook variant)")
    axes[2].set_xlabel("time (s)")
    for ax in axes:
        ax.grid(True, alpha=0.3)
        ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out_png, dpi=110)
    print(f"wrote {args.out_png}")


if __name__ == "__main__":
    main()
