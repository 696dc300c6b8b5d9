"""Windowed streaming extraction (ops/longform ramp + features window +
api.convert_wav_stream).

The streaming claim: features for the first conversion chunk are ready
after ONE context-padded window of extraction, and windowed features match
full-utterance extraction in the span interior.  The two documented
deviations are quantified here: the loudness top-db clamp is window- (not
global-) relative, and ContentVec's transformer attends only within the
window (tested with a LOCAL content mock so the alignment machinery is
checked exactly; the transformer's boundary sensitivity is a model
property, blended away by the chunk crossfade).
"""

import numpy as np
import pytest

from serenade_tpu.features import (
    FeatureConfig, _prepare_audio, extract_signal_features_group,
    extract_stream_window, stream_total_frames,
)
from serenade_tpu.ops.longform import (
    split_chunks, split_chunks_ramp, stitch_mel_stream,
)
from tests.test_serving import tiny_experiment  # noqa: F401 (fixture)

CONTENT_DIM = 16
_PROJ = np.random.default_rng(7).normal(size=(400, CONTENT_DIM)).astype(
    np.float64)


def local_content_fn(audio16k):
    """Mock content features honoring the REAL ContentVec frame contract
    ((n-400)//160+1 frames of 400-sample windows at 160 hop) but computed
    LOCALLY, so windowed extraction must slice to exactly the same values
    as full-utterance extraction."""
    a = np.asarray(audio16k, np.float64)
    n = max((len(a) - 400) // 160 + 1, 1)
    idx = np.arange(n)[:, None] * 160 + np.arange(400)[None, :]
    pad = np.pad(a, (0, max(0, idx.max() + 1 - len(a))))
    return (pad[idx] @ _PROJ).astype(np.float32)


# ---------------------------------------------------------------------------
# ramp spans
# ---------------------------------------------------------------------------


def test_split_chunks_ramp_covers_and_ramps():
    spans = split_chunks_ramp(6000, 2048, 256, first_chunk=512)
    assert spans[0] == (0, 512)
    # coverage: starts at 0, ends at n, each span overlaps prev by exactly
    # `overlap`, sizes double until they reach `chunk`
    assert spans[-1][1] == 6000
    sizes = [e - s for s, e in spans]
    assert max(sizes) <= 2048
    for i in range(1, len(spans)):
        assert spans[i][0] == spans[i - 1][1] - 256
        assert spans[i][1] > spans[i - 1][1]
    for a, b in zip(sizes[:-1], sizes[1:-1]):
        assert b == min(a * 2, 2048)
    # tail span longer than the crossfade region
    assert sizes[-1] > 256


def test_split_chunks_ramp_degenerate_cases():
    # n below the first chunk: one span
    assert split_chunks_ramp(300, 2048, 256, first_chunk=512) == [(0, 300)]
    # no/huge first chunk: identical to the uniform splitter
    assert split_chunks_ramp(6000, 2048, 256) == split_chunks(6000, 2048, 256)
    assert (split_chunks_ramp(6000, 2048, 256, first_chunk=4096)
            == split_chunks(6000, 2048, 256))
    with pytest.raises(ValueError):
        split_chunks_ramp(6000, 2048, 256, first_chunk=128)


def test_stitch_mel_stream_matches_direct_crossfade():
    """The incremental stitcher must equal a straightforward full-buffer
    crossfade over the same spans (ramped sizes included)."""
    rng = np.random.default_rng(0)
    n, c = 1500, 8
    spans = split_chunks_ramp(n, 512, 64, first_chunk=128)
    mels = [rng.normal(size=(e - s, c)).astype(np.float32)
            for s, e in spans]

    expected = np.zeros((n, c), np.float32)
    expected[spans[0][0]:spans[0][1]] = mels[0]
    prev_end = spans[0][1]
    for (s, e), mel in zip(spans[1:], mels[1:]):
        ov = prev_end - s
        w = np.linspace(0.0, 1.0, ov, dtype=np.float32)[:, None]
        expected[s:prev_end] = expected[s:prev_end] * (1 - w) + mel[:ov] * w
        expected[prev_end:e] = mel[ov:]
        prev_end = e

    segs = list(stitch_mel_stream(spans, iter(mels)))
    # ordered, contiguous, non-overlapping, covering [0, n)
    assert segs[0][0] == 0
    got = np.concatenate([seg for _, seg in segs], axis=0)
    starts = [s for s, _ in segs]
    lengths = [seg.shape[0] for _, seg in segs]
    assert starts == [0] + list(np.cumsum(lengths)[:-1])
    assert got.shape == (n, c)
    np.testing.assert_allclose(got, expected, atol=1e-6)
    # streaming shape: one finalized region per span
    assert len(segs) == len(spans)


# ---------------------------------------------------------------------------
# windowed extraction vs full
# ---------------------------------------------------------------------------


def _synth_notes(seconds, sr=24000):
    """Constant-pitch note segments (1 s each) + broadband floor, so note
    quantization is invariant to where extraction windows cut."""
    rng = np.random.default_rng(3)
    t = np.arange(int(sr * seconds)) / sr
    freqs = [220.0, 262.0, 330.0, 294.0]
    f = np.asarray(freqs)[np.minimum(t.astype(int) % len(freqs),
                                     len(freqs) - 1)]
    wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / sr)
    wav += 1e-3 * rng.normal(size=len(wav))
    return wav.astype(np.float32)


def test_windowed_signal_features_match_full_interior():
    fc = FeatureConfig(num_mels=16)
    audio = _prepare_audio("w", _synth_notes(6.0), fc.sampling_rate, fc)
    n = stream_total_frames(len(audio), fc, with_hubert=False)

    # full-utterance extraction
    from serenade_tpu.features import _bucketed

    audio_b, n_frames = _bucketed(audio, fc.hop_size)
    full = extract_signal_features_group([audio_b], fc, 70.0, 1100.0,
                                         "viterbi")[0]

    span = (256, 448)  # interior span, ctx on both sides
    win = extract_stream_window(audio, span, fc, 70.0, 1100.0,
                                ctx_frames=128, wire_dtype="float32")
    s, e = span
    # F0: YIN+Viterbi receptive field is tens of frames; with 1.28 s of
    # context the span interior must match the full extraction exactly
    np.testing.assert_allclose(win["f0"][:, 0], full["f0"][s:e], atol=1e-4)
    # loudness: identical up to the window-vs-global top-db clamp, which
    # only moves bins already ~80 dB under the utterance peak
    np.testing.assert_allclose(win["loud"][:, 0], full["loud"][s:e],
                               atol=5e-3)
    assert win["score"].shape == (e - s, 1)
    assert np.isfinite(win["score"]).all()

    # first window (no left context available) aligns from frame 0
    first = extract_stream_window(audio, (0, 128), fc, 70.0, 1100.0,
                                  ctx_frames=128, wire_dtype="float32")
    np.testing.assert_allclose(first["f0"][:, 0], full["f0"][:128],
                               atol=1e-4)

    # span beyond the stream bound raises instead of mis-slicing
    with pytest.raises(ValueError):
        extract_stream_window(audio, (n + 128, n + 256), fc, 70.0, 1100.0,
                              ctx_frames=0, wire_dtype="float32")


def test_windowed_content_features_slice_exactly():
    """With a local content fn obeying the real frame contract, windowed
    hubert must be a bitwise slice of full-utterance hubert (the window
    start lands on an exact 16 kHz sample; resampling is polyphase FIR,
    identical in the interior)."""
    from serenade_tpu.utils.audio import resample

    fc = FeatureConfig(num_mels=16)
    audio = _prepare_audio("w", _synth_notes(6.0), fc.sampling_rate, fc)
    full_hub = local_content_fn(resample(audio, fc.sampling_rate, 16000))
    n = stream_total_frames(len(audio), fc)
    assert full_hub.shape[0] >= n

    for span in [(0, 128), (128, 384), (384, n)]:
        win = extract_stream_window(audio, span, fc, 70.0, 1100.0,
                                    content_fn=local_content_fn,
                                    ctx_frames=128, wire_dtype="float32")
        s, e = span
        np.testing.assert_allclose(win["hubert"], full_hub[s:e], atol=2e-5)


def test_windowed_score_matches_full_on_constant_notes():
    """Constant-pitch notes: windowed note segmentation (with boundary
    notes kept whole by the context) quantizes to the same frame score as
    full-utterance segmentation."""
    from serenade_tpu.features import _bucketed
    from serenade_tpu.ops.midi import (
        f0_to_note_events, midi_note_array_to_hz, notes_to_frames,
    )

    fc = FeatureConfig(num_mels=16)
    audio = _prepare_audio("w", _synth_notes(6.0), fc.sampling_rate, fc)
    audio_b, _ = _bucketed(audio, fc.hop_size)
    full = extract_signal_features_group([audio_b], fc, 70.0, 1100.0,
                                         "viterbi")[0]
    n = stream_total_frames(len(audio), fc, with_hubert=False)
    notes, intervals = f0_to_note_events(full["f0"][:n], frame_shift_s=0.01)
    full_score = midi_note_array_to_hz(
        notes_to_frames(notes, intervals, len(audio) / fc.sampling_rate),
        log_f0=True).astype(np.float32)  # the h5 contract dtype

    span = (256, 448)
    win = extract_stream_window(audio, span, fc, 70.0, 1100.0,
                                ctx_frames=128, wire_dtype="float32")
    s, e = span
    agree = np.mean(win["score"][:, 0] == full_score[s:e])
    assert agree >= 0.98, f"score agreement {agree:.3f}"


# ---------------------------------------------------------------------------
# end-to-end streaming conversion
# ---------------------------------------------------------------------------


def test_convert_wav_stream_end_to_end(tiny_experiment):  # noqa: F811
    import jax

    conv, _items = tiny_experiment
    fc = FeatureConfig.from_dict(conv.config)
    wav = _synth_notes(3.0)
    old_content = conv._content_fn
    conv._content_fn = local_content_fn
    try:
        prepared = _prepare_audio("s", wav, fc.sampling_rate, fc)
        n = stream_total_frames(len(prepared), fc)

        ref = _items[list(_items)[0]]
        conv._key = jax.random.key(123)
        segs = list(conv.convert_wav_stream(
            wav, fc.sampling_rate, ref, chunk_frames=128,
            overlap_frames=32, first_chunk_frames=64,
            extract_ctx_frames=64))
        total = sum(seg.shape[0] for _, seg, _ in segs)
        assert total == n
        assert segs[0][0] == 0
        starts = [s for s, _, _ in segs]
        lengths = [seg.shape[0] for _, seg, _ in segs]
        assert starts == [0] + list(np.cumsum(lengths)[:-1])
        for _, seg, wav_seg in segs:
            assert np.isfinite(seg).all()
            if conv.vocoder is not None:
                assert wav_seg is not None and np.isfinite(wav_seg).all()

        # deterministic: same seed, same stream
        conv._key = jax.random.key(123)
        segs2 = list(conv.convert_wav_stream(
            wav, fc.sampling_rate, ref, chunk_frames=128,
            overlap_frames=32, first_chunk_frames=64,
            extract_ctx_frames=64))
        for (s1, m1, _), (s2, m2, _) in zip(segs, segs2):
            assert s1 == s2
            np.testing.assert_allclose(m1, m2, atol=1e-5)

        # the first finalized region arrives after ONE ramped chunk:
        # its extent is bounded by first_chunk minus the overlap
        assert segs[0][1].shape[0] <= 64
    finally:
        conv._content_fn = old_content


def test_stream_with_packed_reference_matches_raw(tiny_experiment):  # noqa: F811
    """A registered style's device-resident packed handle conditions the
    stream identically to the raw feature dict (it skips the per-request
    normalization + upload, nothing else)."""
    import jax

    from serenade_tpu.serving import BatchingConverter

    conv, _items = tiny_experiment
    ref = _items[list(_items)[0]]
    wav = _synth_notes(2.0)
    old_content = conv._content_fn
    conv._content_fn = local_content_fn
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    try:
        b.register_reference("S", ref)
        kwargs = dict(chunk_frames=128, overlap_frames=32,
                      first_chunk_frames=64, extract_ctx_frames=64)
        conv._key = jax.random.key(5)
        raw_segs = list(conv.convert_wav_stream(wav, 24000, ref, **kwargs))
        conv._key = jax.random.key(5)
        packed_segs = list(conv.convert_wav_stream(
            wav, 24000, b.packed_reference("S"), **kwargs))
        assert len(raw_segs) == len(packed_segs)
        for (s1, m1, _), (s2, m2, _) in zip(raw_segs, packed_segs):
            assert s1 == s2
            np.testing.assert_allclose(m1, m2, atol=1e-5)
    finally:
        conv._content_fn = old_content
        b.close()


def test_convert_wav_stream_zero_ctx_clamped(tiny_experiment):  # noqa: F811
    """extract_ctx_frames=0 (a legal serving query param) must not trip
    the ContentVec receptive-field guard on interior windows — the
    window context clamps to the 2 frames the conv stack consumes."""
    conv, _items = tiny_experiment
    fc = FeatureConfig.from_dict(conv.config)
    wav = _synth_notes(3.0)
    old_content = conv._content_fn
    conv._content_fn = local_content_fn
    try:
        n = stream_total_frames(
            len(_prepare_audio("s", wav, fc.sampling_rate, fc)), fc)
        segs = list(conv.convert_wav_stream(
            wav, fc.sampling_rate, _items[list(_items)[0]],
            chunk_frames=128, overlap_frames=32, first_chunk_frames=64,
            extract_ctx_frames=0))
        assert sum(seg.shape[0] for _, seg, _ in segs) == n
    finally:
        conv._content_fn = old_content


def test_live_stream_matches_uniform_windowed(tiny_experiment):  # noqa: F811
    """convert_wav_stream_live over arbitrary chunk boundaries must equal
    convert_wav_stream with the same uniform span schedule — chunking
    granularity of the INPUT must not change the output."""
    import jax

    conv, _items = tiny_experiment
    ref = _items[list(_items)[0]]
    wav = _synth_notes(3.0)
    old_content = conv._content_fn
    conv._content_fn = local_content_fn
    try:
        conv._key = jax.random.key(3)
        ref_segs = list(conv.convert_wav_stream(
            wav, 24000, ref, chunk_frames=128, overlap_frames=32,
            first_chunk_frames=128, extract_ctx_frames=64))

        conv._key = jax.random.key(3)
        pieces = np.array_split(wav, [999, 5000, 17000, 33333, 50000])
        live_segs = list(conv.convert_wav_stream_live(
            iter(pieces), 24000, ref, chunk_frames=128,
            overlap_frames=32, extract_ctx_frames=64))

        assert [s for s, _, _ in live_segs] == [s for s, _, _ in ref_segs]
        for (_, m1, _), (_, m2, _) in zip(live_segs, ref_segs):
            np.testing.assert_allclose(m1, m2, atol=1e-5)

        # one-big-chunk input: same again (the degenerate live case)
        conv._key = jax.random.key(3)
        one = list(conv.convert_wav_stream_live(
            iter([wav]), 24000, ref, chunk_frames=128, overlap_frames=32,
            extract_ctx_frames=64))
        for (_, m1, _), (_, m2, _) in zip(one, ref_segs):
            np.testing.assert_allclose(m1, m2, atol=1e-5)
    finally:
        conv._content_fn = old_content


def test_live_stream_validates_chunks(tiny_experiment):  # noqa: F811
    import pytest as _pytest

    conv, _items = tiny_experiment
    ref = _items[list(_items)[0]]
    old_content = conv._content_fn
    conv._content_fn = local_content_fn
    try:
        bad = np.full(2000, np.nan, np.float32)
        with _pytest.raises(ValueError, match="non-finite"):
            list(conv.convert_wav_stream_live(
                iter([_synth_notes(1.0), bad]), 24000, ref))
        with _pytest.raises(ValueError, match="too short"):
            list(conv.convert_wav_stream_live(
                iter([np.zeros(100, np.float32)]), 24000, ref))
        with _pytest.raises(ValueError, match="Hz audio"):
            list(conv.convert_wav_stream_live(
                iter([_synth_notes(1.0)]), 16000, ref))
    finally:
        conv._content_fn = old_content


def test_convert_wav_stream_tracks_full_extraction(tiny_experiment):  # noqa: F811
    """Windowed streaming output stays close to the same conversion run
    from FULL-utterance extraction over identical spans and CFM keys —
    the quantified cost of windowing (loudness clamp + content windows)."""
    import jax

    conv, _items = tiny_experiment
    fc = FeatureConfig.from_dict(conv.config)
    wav = _synth_notes(3.0)
    old_content = conv._content_fn
    conv._content_fn = local_content_fn
    try:
        prepared = _prepare_audio("s", wav, fc.sampling_rate, fc)
        n = stream_total_frames(len(prepared), fc)
        ref = _items[list(_items)[0]]

        conv._key = jax.random.key(7)
        stream_mel = np.concatenate(
            [seg for _, seg, _ in conv.convert_wav_stream(
                wav, fc.sampling_rate, ref, chunk_frames=128,
                overlap_frames=32, first_chunk_frames=64,
                extract_ctx_frames=64)], axis=0)

        # full extraction -> identical ramped spans through the same
        # chunk converter and key sequence
        full = conv.extract_from_wav(wav, fc.sampling_rate, "s")
        feats = {k: np.asarray(full[k])[:n]
                 for k in ("hubert", "score", "loud")}
        spans = split_chunks_ramp(n, 128, 32, first_chunk=64)
        convert_chunk = conv._chunk_converter(ref)
        conv._key = jax.random.key(7)
        mels = [convert_chunk({k: v[s:e] for k, v in feats.items()})
                for s, e in spans]
        full_mel = np.concatenate(
            [seg for _, seg in stitch_mel_stream(spans, iter(mels))],
            axis=0)

        assert stream_mel.shape == full_mel.shape
        err = float(np.sqrt(np.mean((stream_mel - full_mel) ** 2)))
        assert err < 0.15, f"windowed-vs-full mel RMSE {err:.4f}"
    finally:
        conv._content_fn = old_content


def test_live_default_rung_is_sub_second():
    """The shipped live-duplex default is the measured +0.61 s rung
    (64/32/16 — docs/SERVING.md lag/quality ladder: every rung's MCD vs
    offline sits below the CFM stochastic floor, so the smallest-lag
    rung ships).  Pins the API signature AND the serving query defaults
    so they cannot drift apart or silently revert to the +3.0 s rung."""
    import inspect
    import re

    from serenade_tpu.api import Converter

    sig = inspect.signature(Converter.convert_wav_stream_live)
    assert sig.parameters["chunk_frames"].default == 64
    assert sig.parameters["extract_ctx_frames"].default == 32
    assert sig.parameters["overlap_frames"].default == 16

    # the serving endpoint parses the same defaults from the query table
    import serenade_tpu.serving as serving

    src = inspect.getsource(serving)
    # the live handler's query defaults (the block that feeds
    # convert_wav_stream_live)
    m = re.search(
        r"convert_wav_stream_live\(\s*audio_iter\(\), sr, ref,"
        r".*?chunk_frames=int\(\s*query\.get\(\"chunk_frames\", \[\"(\d+)\"\]\)"
        r".*?overlap_frames=int\(\s*query\.get\(\"overlap_frames\", \[\"(\d+)\"\]\)"
        r".*?extract_ctx_frames=int\(\s*query\.get\(\"extract_ctx_frames\", \[\"(\d+)\"\]\)",
        src, re.S)
    assert m, "live handler defaults not found"
    assert (m.group(1), m.group(2), m.group(3)) == ("64", "16", "32")
