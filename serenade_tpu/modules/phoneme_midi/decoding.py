"""Framewise onset/offset decoding to note events (host-side numpy).

Counterpart of reference modules/phoneme_midi/decoding.py:8-159: sigmoid
the 3 frame logits, peak-pick onsets/offsets, segment notes between
onsets (offset chosen by offset-peak or activation-dropout confidence),
and summarize each note's pitch from an F0 track (median / hann-weighted
mean / weighted median).

The reference computes F0 with librosa.pyin (decoding.py:36-45); here
the pYIN-class ``yin_f0_viterbi`` op supplies it (multi-candidate CMND
dips + a V/UV Viterbi trellis — the same probabilistic-continuity idea
as pYIN's HMM, jitted on the accelerator).  ``f0_mode: "yin"`` in the
decoder config keeps the plain single-dip YIN.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from serenade_tpu.ops.midi import hz_to_midi


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def peak_select(pred: np.ndarray, threshold: float) -> np.ndarray:
    """Keep only local maxima of supra-threshold runs (reference
    `_peak_selector`, decoding.py:64-76)."""
    out = np.zeros_like(pred)
    local_max_idx = 0
    for i in range(len(pred)):
        if pred[i] > threshold:
            if pred[i] > pred[local_max_idx]:
                local_max_idx = i
        else:
            if local_max_idx != 0:
                out[local_max_idx] = pred[local_max_idx]
                local_max_idx = 0
    return out


def _weighted_median(values: np.ndarray, weights: np.ndarray) -> float:
    order = np.argsort(values)
    v, w = values[order], weights[order]
    cw = np.cumsum(w)
    if cw[-1] <= 0:
        return float("nan")
    cutoff = 0.5 * cw[-1]
    return float(v[np.searchsorted(cw, cutoff)])


def decode_notes(onsets, f0_hz, pitch_sum: str, offsets=None, frames=None
                 ) -> Tuple[List[float], List[Tuple[int, int]]]:
    """Segment notes between onset peaks (reference `_decode_notes`,
    decoding.py:79-159)."""
    with np.errstate(divide="ignore"):
        f0_midi = np.where(f0_hz > 0, hz_to_midi(np.maximum(f0_hz, 1e-9)),
                           np.nan)

    onset_hit = np.asarray(onsets) > 0
    onset_idx = np.nonzero(onset_hit)[0]
    if offsets is not None:
        offset_hit = np.asarray(offsets) > 0
    if frames is not None:
        fq = (np.asarray(frames) >= 0.5).astype(np.float32)
        frame_drop = np.concatenate([fq[:-1] - fq[1:], fq[-1:]]) == 1

    pitches, intervals = [], []
    n = len(onset_hit)
    for i, onset in enumerate(onset_idx):
        next_onset = onset_idx[i + 1] if i + 1 < len(onset_idx) else n - 1

        offset = None
        offset_conf = 0.0
        frame_conf = 0.0
        for j in range(onset + 2, next_onset):
            if offsets is not None and offset_hit[j]:
                if offset_conf < offsets[j]:
                    offset_conf = offsets[j]
                    offset = j
            if frames is not None and frame_drop[j]:
                conf, k = 0.0, j + 1
                while k < next_onset and frames[k] < 0.5:
                    conf = max(1.0 - frames[k], conf)
                    k += 1
                if frame_conf < conf:
                    frame_conf = conf
                    offset = j
        if offset is None:
            offset = next_onset - 1

        seg = f0_midi[onset:offset + 1]
        valid = ~np.isnan(seg)
        if pitch_sum == "median":
            pitch = float(np.median(seg[valid])) if valid.any() else float("nan")
        elif pitch_sum == "weighted_mean":
            w = np.hanning(len(seg) + 2)[1:-1]
            num = np.nansum(seg * w)
            den = w[valid].sum()
            pitch = float(num / den) if den > 0 else float("nan")
        elif pitch_sum == "weighted_median":
            w = np.hanning(len(seg) + 2)[1:-1].copy()
            w[~valid] = 0.0
            pitch = (_weighted_median(np.nan_to_num(seg), w / w.sum())
                     if w.sum() > 0 else float("nan"))
        else:
            raise ValueError(f"unknown pitch_sum {pitch_sum!r}")

        if np.isnan(pitch):
            pitch = 0.0
        if offset > onset:
            pitches.append(pitch)
            intervals.append((int(onset), int(offset) + 1))
    return pitches, intervals


class FramewiseDecoder:
    def __init__(self, config: dict):
        self.sr = config["sample_rate"]
        self.win_length = config["win_length"]
        self.hop_length = config["hop_length"]
        self.onset_threshold = config["onset_threshold"]
        self.offset_threshold = config["offset_threshold"]
        self.pitch_sum = config["pitch_sum"]
        self.f0_mode = config.get("f0_mode", "viterbi")

    def decode(self, pred: np.ndarray, audio=None, f0=None):
        """pred: (T, 3) frame logits -> (pitches, frame_intervals)."""
        onset = _sigmoid(pred[:, 0])
        offset = _sigmoid(pred[:, 1])
        activation = _sigmoid(pred[:, 2])

        onsets = peak_select(onset, self.onset_threshold)
        offsets = peak_select(offset, self.offset_threshold)

        if f0 is None:
            if audio is None:
                raise ValueError("either audio or f0 must be given")
            from serenade_tpu.ops.f0 import yin_f0, yin_f0_viterbi

            estimate = yin_f0_viterbi if self.f0_mode == "viterbi" else yin_f0
            frame_period_ms = self.hop_length * 1000.0 / self.sr
            f0_arr, _ = estimate(
                np.asarray(audio, np.float32), fs=self.sr, f0_floor=65.0,
                f0_ceil=2093.0, frame_period_ms=frame_period_ms,
                win_length=self.win_length,
            )
            f0 = np.asarray(f0_arr)
        n = min(len(f0), len(onsets))
        return decode_notes(
            onsets[:n], f0[:n], self.pitch_sum, offsets=offsets[:n],
            frames=activation[:n],
        )
