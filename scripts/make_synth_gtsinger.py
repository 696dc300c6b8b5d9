#!/usr/bin/env python3
"""Generate a GTSinger-shaped synthetic singing corpus for the full-budget
framework-validation run (VERDICT round-3 item 1).

The real GTSinger DB can't be downloaded here (zero egress), so this builds
a *parallel* corpus with the exact directory layout stage 0 expects
(``{db}/EN/{singer}/{song}/{Style}_Group/0000.wav`` — reference recipe
egs/gtsinger/ssc1/run.sh stage 0 + local/create_wav_scp.py): every song is
rendered once per style from the SAME melody/vowel/loudness track, so a
style-converted utterance has a true target rendition and MCD / log-F0
RMSE trends are meaningful, not vacuous.

Renditions are additive-harmonic singing: a random-walk melody over a
pentatonic scale with phrase breaths, per-segment vowel formants, vibrato,
and style-dependent source spectra (tilt / noise / formant boosts) chosen
so the four GTSinger style groups are separable in the mel domain (the
GST encoder must be able to recover them) while the melody+vowel content
is shared across styles (the content path must carry it).

Optionally fabricates a seeded random-init ContentVec checkpoint in the
released ``lengyue233/content-vec-best`` layout (HubertModelWithFinalProj;
reference bin/preprocess.py:41-50) so stage 1 runs the REAL content
extractor end to end rather than the --allow-missing-hubert bypass.

Usage:
  python scripts/make_synth_gtsinger.py --out downloads/gtsinger_synth \
      --train-songs 180 --contentvec-out pt_models/contentvec.pt
"""

import argparse
import os

import numpy as np

SR = 24000
HOP = 240  # 10 ms frames
STYLES = ("Mixed_Voice", "Breathy", "Falsetto", "Pharyngeal")

# vowel formant table (F1, F2, F3) in Hz
VOWELS = np.array([
    [800.0, 1150.0, 2900.0],   # a
    [400.0, 1600.0, 2700.0],   # e
    [250.0, 1750.0, 3000.0],   # i
    [400.0, 800.0, 2600.0],    # o
    [350.0, 600.0, 2700.0],    # u
])
BWS = np.array([90.0, 120.0, 180.0])

# style -> (tilt dB/oct, noise gain, vibrato cents, formant scale,
#           pharyngeal 3k boost dB).  No pitch shifts: conversion keeps the
#           source score's F0, so parallel targets must agree in pitch for
#           log-F0 RMSE to measure conversion fidelity; styles separate in
#           the spectral envelope (register tilt / breath noise / formant
#           placement), which is what the GST encoder conditions on.
STYLE_PARAMS = {
    "Mixed_Voice": (-6.0, 0.020, 25.0, 1.00, 0.0),
    "Breathy": (-9.0, 0.120, 15.0, 1.00, 0.0),
    "Falsetto": (-16.0, 0.050, 20.0, 1.12, 0.0),
    "Pharyngeal": (-3.0, 0.010, 45.0, 0.95, 8.0),
}

PENTATONIC = np.array([0, 2, 4, 7, 9])


def make_melody(rng, seconds, base_midi):
    """Frame-rate (10 ms) melody tracks: f0 (Hz, 0 = unvoiced), vowel idx,
    gain.  Phrases of 3-7 notes separated by breath gaps."""
    n_frames = int(seconds * SR / HOP)
    f0 = np.zeros(n_frames)
    vowel = np.zeros(n_frames, np.int64)
    gain = np.zeros(n_frames)
    t = 0
    degree = rng.integers(0, 5)
    octave = 0
    while t < n_frames:
        # breath gap 150-350 ms
        t += int(rng.uniform(15, 35))
        n_notes = rng.integers(3, 8)
        phrase_vowels = rng.integers(0, len(VOWELS), size=n_notes)
        for i in range(n_notes):
            if t >= n_frames:
                break
            dur = int(rng.uniform(25, 80))  # 250-800 ms
            step = rng.integers(-2, 3)
            degree += step
            while degree < 0:
                degree += 5
                octave -= 1
            while degree >= 5:
                degree -= 5
                octave += 1
            octave = int(np.clip(octave, -1, 1))
            midi = base_midi + PENTATONIC[degree] + 12 * octave
            hz = 440.0 * 2.0 ** ((midi - 69) / 12.0)
            end = min(t + dur, n_frames)
            f0[t:end] = hz
            vowel[t:end] = phrase_vowels[i]
            # note-level dynamics with soft attack/release
            amp = rng.uniform(0.5, 1.0)
            seg = np.ones(end - t) * amp
            a = min(8, len(seg))
            seg[:a] *= np.linspace(0.3, 1.0, a)
            r = min(6, len(seg))
            seg[-r:] *= np.linspace(1.0, 0.5, r)
            gain[t:end] = seg
            t = end
    return f0, vowel, gain


def _envelope_gains(freqs, vowel_idx, tilt_db_oct, boost3k_db,
                    formant_scale=1.0):
    """Spectral envelope gain at ``freqs`` (F, K) for per-frame vowels
    (F,): formant resonances + source tilt + optional pharyngeal boost."""
    fmt = VOWELS[vowel_idx] * formant_scale  # (F, 3)
    g = np.zeros(freqs.shape)
    for j in range(3):
        fj = fmt[:, j:j + 1]
        g = g + (1.0 / (j + 1.0)) / (1.0 + ((freqs - fj) / BWS[j]) ** 2)
    g = g + 0.01
    tilt = 10.0 ** (tilt_db_oct / 20.0 * np.log2(np.maximum(freqs, 60.0)
                                                 / 500.0))
    if boost3k_db:
        tilt = tilt * 10.0 ** (
            boost3k_db / 20.0 * np.exp(-((freqs - 3000.0) / 700.0) ** 2))
    return g * tilt


def render(f0_frames, vowel_frames, gain_frames, style, rng, n_harm=36):
    """Additive-harmonic rendition of one style; returns float32 waveform."""
    tilt, noise_g, vib_cents, fscale, boost = STYLE_PARAMS[style]
    f0 = f0_frames
    n_frames = len(f0)
    # vibrato (5.5 Hz) + slow drift, at frame rate
    tf = np.arange(n_frames) * HOP / SR
    vib = 2.0 ** ((vib_cents / 1200.0) * np.sin(2 * np.pi * 5.5 * tf
                                                + rng.uniform(0, 6.28)))
    f0v = f0 * vib
    voiced = f0 > 0

    k = np.arange(1, n_harm + 1)
    freqs = np.where(voiced[:, None], f0v[:, None], 200.0) * k  # (F, K)
    amps = _envelope_gains(freqs, vowel_frames, tilt, boost, fscale)
    amps = np.where((freqs < 0.45 * SR) & voiced[:, None], amps, 0.0)
    amps = amps * gain_frames[:, None]

    n_samples = n_frames * HOP
    # sample-rate f0 via linear interp of frame track
    ts = np.arange(n_samples) / SR
    f0s = np.interp(ts, tf, f0v * voiced)
    phase = 2.0 * np.pi * np.cumsum(f0s) / SR
    amps_s = np.repeat(amps, HOP, axis=0)  # (n_samples, K)
    wav = np.sum(amps_s * np.sin(phase[:, None] * k[None, :]), axis=1)

    # aspiration noise shaped by the vowel envelope + voicing gain
    noise = rng.normal(size=n_samples)
    # one-pole lowpass (AR(1) on 4x-decimated noise) to band-limit it
    b = 0.25
    dec = noise[::4]
    try:
        from scipy.signal import lfilter
        acc = lfilter([b], [1.0, -(1.0 - b)], dec)
    except ImportError:
        acc = np.zeros(len(dec))
        prev = 0.0
        for i in range(len(dec)):
            prev = (1 - b) * prev + b * dec[i]
            acc[i] = prev
    lp = np.repeat(acc, 4)[:n_samples]
    env = np.repeat(gain_frames * (0.4 + 0.6 * voiced), HOP)
    wav = wav + noise_g * 6.0 * lp * env

    peak = np.max(np.abs(wav)) + 1e-9
    return (0.6 * wav / peak).astype(np.float32)


def fabricate_contentvec(path, seed=0):
    """Seeded random-init checkpoint in the released layout (see
    tests/test_contentvec.py::_released_twin)."""
    import torch
    import transformers

    config = transformers.HubertConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, classifier_proj_size=256,
        apply_spec_augment=False,
    )

    class HubertModelWithFinalProj(transformers.HubertModel):
        def __init__(self, config):
            super().__init__(config)
            self.final_proj = torch.nn.Linear(
                config.hidden_size, config.classifier_proj_size)

    torch.manual_seed(seed)
    model = HubertModelWithFinalProj(config).eval()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(model.state_dict(), path)
    print(f"wrote fabricated ContentVec state dict to {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train-songs", type=int, default=180)
    p.add_argument("--dev-songs", type=int, default=3)
    p.add_argument("--test-songs", type=int, default=3)
    p.add_argument("--seconds", type=float, default=10.5)
    p.add_argument("--seed", type=int, default=2026)
    p.add_argument("--contentvec-out", default=None)
    args = p.parse_args()

    from serenade_tpu.utils.audio import write_wav

    if args.contentvec_out and not os.path.exists(args.contentvec_out):
        fabricate_contentvec(args.contentvec_out)

    rng = np.random.default_rng(args.seed)
    singers = (("Tenor1", 57), ("Soprano1", 64))  # base MIDI A3 / E4
    songs = [f"tune{i:03d}" for i in range(args.train_songs)]
    songs += [f"song2{chr(97 + i)}" for i in range(args.dev_songs)]   # dev
    songs += [f"song3{chr(97 + i)}" for i in range(args.test_songs)]  # test

    n = 0
    for si, song in enumerate(songs):
        singer, base = singers[si % len(singers)]
        seconds = args.seconds * rng.uniform(0.8, 1.2)
        f0, vowel, gain = make_melody(rng, seconds, base)
        for style in STYLES:
            d = os.path.join(args.out, "EN", singer, song,
                             f"{style}_Group")
            os.makedirs(d, exist_ok=True)
            wav = render(f0, vowel, gain, style,
                         np.random.default_rng(args.seed + 7919 * si))
            write_wav(os.path.join(d, "0000.wav"), wav, SR)
            n += 1
        if (si + 1) % 20 == 0:
            print(f"  {si + 1}/{len(songs)} songs")
    total_s = n * args.seconds
    print(f"wrote {n} wavs (~{total_s / 3600.0:.2f} h) under {args.out}")


if __name__ == "__main__":
    main()
