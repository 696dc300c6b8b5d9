"""Score-MIDI utilities (reference preprocess.py:117,206-260 contract):
Hz/MIDI conversion, note-sequence framing, F0-based note segmentation."""

import numpy as np

from serenade_tpu.ops.midi import (
    f0_to_note_events,
    hz_to_midi,
    midi_note_array_to_hz,
    midi_to_hz,
    note_seq_to_frames,
    notes_to_frames,
)


def test_midi_hz_roundtrip():
    midis = np.array([57.0, 60.0, 69.0, 72.5])
    np.testing.assert_allclose(hz_to_midi(midi_to_hz(midis)), midis,
                               atol=1e-9)
    assert abs(float(midi_to_hz(np.array(69.0))) - 440.0) < 1e-9


def test_midi_note_array_to_hz_zeros_and_log():
    arr = np.array([0.0, 69.0, 0.0, 57.0])
    hz = midi_note_array_to_hz(arr)
    assert hz[0] == 0.0 and hz[2] == 0.0  # rests stay 0
    assert abs(hz[1] - 440.0) < 1e-6
    lhz = midi_note_array_to_hz(arr, log_f0=True)
    assert lhz[0] == 0.0
    np.testing.assert_allclose(lhz[1], np.log(440.0), atol=1e-6)


def test_note_seq_to_frames():
    # GTSinger layout: entries with parallel note/note_start/note_end lists
    notes = [dict(note=[60, 64], note_start=[0.0, 0.15],
                  note_end=[0.1, 0.3])]
    frames = note_seq_to_frames(notes, frame_shift_s=0.01)
    assert frames[0] == 60 and frames[5] == 60
    assert frames[12] == 0  # gap between the notes
    assert frames[20] == 64
    assert len(frames) == 30


def test_notes_to_frames_matches_intervals():
    midi_values = [72, 67]
    intervals = [(0.0, 0.2), (0.25, 0.5)]
    frames = notes_to_frames(midi_values, intervals, total_seconds=0.6,
                             shift_ms=10.0)
    assert frames.shape[0] == 60
    assert frames[10] == 72 and frames[30] == 67
    assert frames[22] == 0 and frames[55] == 0


def test_f0_to_note_events_segments_stable_pitch():
    # two held notes with a silent gap -> two events at the right pitches
    f0 = np.concatenate([
        np.full(40, 261.63), np.zeros(10), np.full(40, 329.63)])
    midis, intervals = f0_to_note_events(f0, frame_shift_s=0.01)
    assert midis == [60, 64]  # C4, E4
    (s1, e1), (s2, e2) = intervals
    assert s1 < e1 <= s2 < e2
    assert abs(e1 - 0.40) < 0.05 and abs(s2 - 0.50) < 0.05
