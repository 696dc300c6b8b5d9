"""Phoneme/MIDI transcriber parity vs a torch twin of the reference layout
(modules/phoneme_midi/subnetworks.py naming), plus decoder unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.modules.phoneme_midi.decoding import (
    decode_notes,
    peak_select,
)

N_MELS = 20
MODEL_SIZE = 32  # model_complexity 2


def _torch_modules():
    import torch
    from torch import nn

    class ConvStack(nn.Module):
        def __init__(self, input_features, output_features, dilated=False):
            super().__init__()
            first = (
                nn.Conv2d(1, output_features // 16, (3, 3), padding=(2, 1),
                          dilation=(2, 1))
                if dilated else
                nn.Conv2d(1, output_features // 16, (3, 3), padding=1)
            )
            self.cnn = nn.Sequential(
                first,
                nn.BatchNorm2d(output_features // 16), nn.ReLU(),
                nn.Conv2d(output_features // 16, output_features // 16,
                          (3, 3), padding=1),
                nn.BatchNorm2d(output_features // 16), nn.ReLU(),
                nn.MaxPool2d((1, 2)), nn.Dropout(0.25),
                nn.Conv2d(output_features // 16, output_features // 8,
                          (3, 3), padding=1),
                nn.BatchNorm2d(output_features // 8), nn.ReLU(),
                nn.MaxPool2d((1, 2)), nn.Dropout(0.25),
            )
            self.fc = nn.Sequential(
                nn.Linear((output_features // 8) * (input_features // 4),
                          output_features),
                nn.Dropout(0.5),
            )

        def forward(self, data):
            x = self.cnn(data)
            x = x.transpose(1, 2).flatten(-2)
            return self.fc(x)

    class BiLSTM(nn.Module):
        def __init__(self, input_features, recurrent_features):
            super().__init__()
            self.rnn = nn.LSTM(input_features, recurrent_features,
                               batch_first=True, bidirectional=True)

        def forward(self, x):
            return self.rnn(x)[0]

    class Phone(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_stack = ConvStack(N_MELS, MODEL_SIZE)
            self.rnn = BiLSTM(MODEL_SIZE, MODEL_SIZE // 2)
            self.fc = nn.Linear(MODEL_SIZE, 39)

        def forward(self, x):
            return self.fc(self.rnn(self.conv_stack(x)))

    class Transcriber(nn.Module):
        def __init__(self):
            super().__init__()
            self.lang_model = Phone()
            self.lang_conv_stack = ConvStack(38, MODEL_SIZE)
            self.lang_rnn = BiLSTM(MODEL_SIZE, MODEL_SIZE // 2)
            self.pitch_conv_stack = ConvStack(N_MELS, MODEL_SIZE, dilated=True)
            self.pitch_rnn = BiLSTM(MODEL_SIZE, MODEL_SIZE // 2)
            self.combined_rnn = BiLSTM(MODEL_SIZE * 2, MODEL_SIZE // 2)
            self.combined_fc = nn.Linear(MODEL_SIZE, 3)

        def forward(self, mel):  # mel: (B, T, n_mels)
            lang_logits = self.lang_model(mel.unsqueeze(1))
            lang = self.lang_conv_stack(lang_logits[..., :38].unsqueeze(1))
            lang = self.lang_rnn(lang)
            pitch = self.pitch_conv_stack(mel.unsqueeze(1))
            pitch = self.pitch_rnn(pitch)
            x = self.combined_rnn(torch.cat([pitch, lang], dim=2))
            return self.combined_fc(x)

    torch.manual_seed(0)
    return Transcriber().eval()


def test_transcriber_matches_torch():
    torch = pytest.importorskip("torch")
    from serenade_tpu.modules.phoneme_midi.convert import (
        convert_transcription_model,
    )
    from serenade_tpu.modules.phoneme_midi.model import TranscriptionModel

    ref = _torch_modules()
    mel = np.random.default_rng(0).normal(size=(1, 40, N_MELS)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(mel)).numpy()

    params = convert_transcription_model(ref.state_dict(), {})
    model = TranscriptionModel(n_mels=N_MELS, model_size=MODEL_SIZE)
    got = np.asarray(model.apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_peak_select():
    pred = np.array([0.0, 0.2, 0.9, 0.7, 0.1, 0.0, 0.8, 0.85, 0.2])
    peaks = peak_select(pred, 0.5)
    assert peaks[2] == 0.9 and peaks[7] == 0.85
    assert peaks.sum() == pytest.approx(0.9 + 0.85)


def test_decode_notes_simple():
    T = 60
    onsets = np.zeros(T)
    onsets[5] = 0.9
    onsets[35] = 0.9
    offsets = np.zeros(T)
    offsets[30] = 0.8
    frames = np.ones(T)
    f0 = np.full(T, 220.0)
    pitches, intervals = decode_notes(onsets, f0, "median", offsets=offsets,
                                      frames=frames)
    assert len(pitches) == 2
    assert abs(pitches[0] - 57.0) < 0.01  # A3
    assert intervals[0][0] == 5


def test_note_pitch_accuracy_yin_vs_analytic():
    """Quantifies the documented YIN-for-pYIN substitution (reference
    decoding.py:36-45 uses librosa.pyin) at the NOTE level, on the signal
    classes where pYIN's HMM smoothing matters most: steady tone, vibrato,
    and a one-semitone glide with analytically known pitch.

    Measured bound (documented in PARITY.md): note-level median pitch
    error ≤5 cents steady, ≤10 cents vibrato, ≤20 cents glide; note
    onset/offset frame agreement is exact for clean peak logits.
    """
    import numpy as np

    from serenade_tpu.modules.phoneme_midi.decoding import (
        FramewiseDecoder, hz_to_midi,
    )

    sr, hop = 24000, 240  # 10 ms frames
    n_frames = 220
    t = np.arange(n_frames * hop) / sr
    f0_true = np.zeros_like(t)

    def fill(fr0, fr1, fn):
        s0, s1 = fr0 * hop, fr1 * hop
        f0_true[s0:s1] = fn(t[s0:s1] - t[s0])

    # steady 220 Hz / vibrato 330 Hz +-50 cents @ 5.5 Hz / glide +100 cents
    fill(10, 61, lambda tt: 220.0 * np.ones_like(tt))
    fill(70, 131, lambda tt: 330.0 * 2.0 ** (
        (50.0 / 1200.0) * np.sin(2 * np.pi * 5.5 * tt)))
    fill(140, 201, lambda tt: 440.0 * 2.0 ** (tt / tt[-1] * 100.0 / 1200.0))

    phase = 2 * np.pi * np.cumsum(f0_true) / sr
    audio = np.where(f0_true > 0, 0.4 * np.sin(phase), 0.0).astype(np.float32)

    # clean logits: +8 at onset/offset peaks, activation high inside notes
    pred = np.full((n_frames, 3), -8.0, np.float32)
    notes = [(10, 60), (70, 130), (140, 200)]
    for on, off in notes:
        pred[on, 0] = 8.0
        pred[off, 1] = 8.0
        pred[on:off + 1, 2] = 8.0

    dec = FramewiseDecoder(dict(
        sample_rate=sr, win_length=1024, hop_length=hop,
        onset_threshold=0.5, offset_threshold=0.5, pitch_sum="median",
    ))
    pitches, intervals = dec.decode(pred, audio=audio)

    assert intervals == [(on, off + 1) for on, off in notes]

    # truth for the median summarizer = median of the analytic trajectory
    bounds_cents = (5.0, 10.0, 20.0)
    for (on, off), pitch, bound in zip(notes, pitches, bounds_cents):
        seg = f0_true[on * hop:(off + 1) * hop]
        true_midi = float(np.median(hz_to_midi(seg[seg > 0])))
        err_cents = abs(pitch - true_midi) * 100.0
        assert err_cents < bound, (pitch, true_midi, err_cents, bound)


def test_note_pitch_octave_robustness_viterbi():
    """The decoder's default F0 mode is the pYIN-class Viterbi estimator
    (reference decoding.py:36-45 uses librosa.pyin).  On a weak-fundamental
    harmonic tone in noise — the octave trap pYIN's HMM exists for — the
    Viterbi mode recovers the note pitch where plain single-dip YIN
    octave-errs on >half the frames (measured 57% at this SNR)."""
    import numpy as np

    from serenade_tpu.modules.phoneme_midi.decoding import (
        FramewiseDecoder, hz_to_midi,
    )

    sr, hop = 24000, 240
    n_frames = 101
    rng = np.random.default_rng(0)
    t = np.arange(n_frames * hop) / sr
    f0 = 220.0
    sig = (0.08 * np.sin(2 * np.pi * f0 * t)
           + 0.35 * np.sin(2 * np.pi * 2 * f0 * t + 0.3)
           + 0.25 * np.sin(2 * np.pi * 3 * f0 * t + 1.1))
    audio = (sig + 0.12 * rng.standard_normal(len(t))).astype(np.float32)

    pred = np.full((n_frames, 3), -8.0, np.float32)
    on, off = 5, 95
    pred[on, 0] = 8.0
    pred[off, 1] = 8.0
    pred[on:off + 1, 2] = 8.0

    true_midi = float(hz_to_midi(np.asarray(f0)))
    errs = {}
    for mode in ("viterbi", "yin"):
        dec = FramewiseDecoder(dict(
            sample_rate=sr, win_length=1024, hop_length=hop,
            onset_threshold=0.5, offset_threshold=0.5, pitch_sum="median",
            f0_mode=mode,
        ))
        pitches, intervals = dec.decode(pred, audio=audio)
        assert intervals == [(on, off + 1)]
        errs[mode] = abs(pitches[0] - true_midi) * 100.0

    assert errs["viterbi"] < 20.0, errs
    # plain YIN demonstrably falls in the octave trap on this signal —
    # the case that motivates the viterbi default
    assert errs["yin"] > 100.0, errs
