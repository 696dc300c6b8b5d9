"""Long-form chunked conversion: span math and crossfaded stitching."""

import numpy as np

from serenade_tpu.ops.longform import convert_in_chunks, split_chunks


def test_split_chunks_cover_and_overlap():
    spans = split_chunks(1000, 300, 50)
    assert spans[0][0] == 0 and spans[-1][1] == 1000
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 - s1 == 50  # constant overlap
        assert s1 > s0
    assert split_chunks(200, 300, 50) == [(0, 200)]


def test_convert_in_chunks_identity_is_seamless():
    # convert_fn that returns a deterministic function of the features:
    # chunked + crossfaded output must equal the unchunked output exactly
    T, C = 900, 6
    feats = {"hubert": np.random.default_rng(0).normal(size=(T, C)).astype(np.float32)}

    def convert_fn(chunk):
        return np.cumsum(chunk["hubert"] * 0 + 1, axis=0) * 0 + chunk["hubert"] * 2.0

    out = convert_in_chunks(feats, convert_fn, chunk_frames=256,
                            overlap_frames=64)
    assert out.shape == (T, C)
    np.testing.assert_allclose(out, feats["hubert"] * 2.0, atol=1e-6)


def test_convert_in_chunks_crossfades_disagreement():
    # chunks disagree by a constant offset: the seam must blend smoothly
    T = 600
    feats = {"hubert": np.zeros((T, 1), np.float32)}
    calls = []

    def convert_fn(chunk):
        calls.append(chunk["hubert"].shape[0])
        return np.full((chunk["hubert"].shape[0], 1), float(len(calls)),
                       np.float32)

    out = convert_in_chunks(feats, convert_fn, chunk_frames=256,
                            overlap_frames=64)
    assert out.shape == (T, 1)
    # values move monotonically from 1 to len(calls) without jumps > the
    # inter-chunk difference
    diffs = np.abs(np.diff(out[:, 0]))
    assert diffs.max() <= 1.0 / 63 + 1e-6  # blended over 64 frames


def test_stream_matches_offline_and_is_incremental():
    """The streaming generator yields ordered, non-overlapping, finalized
    segments whose concatenation equals the offline result — and emits
    the first segment after ONE chunk conversion, not all of them."""
    from serenade_tpu.ops.longform import convert_in_chunks_stream

    T, C = 900, 4
    feats = {"hubert": np.random.default_rng(1).normal(
        size=(T, C)).astype(np.float32)}
    calls = []

    def convert_fn(chunk):
        calls.append(chunk["hubert"].shape[0])
        return chunk["hubert"] * 3.0

    offline = convert_in_chunks(feats, convert_fn, chunk_frames=256,
                                overlap_frames=64)
    calls.clear()

    gen = convert_in_chunks_stream(feats, convert_fn, chunk_frames=256,
                                   overlap_frames=64)
    start0, seg0 = next(gen)
    assert start0 == 0
    assert len(calls) == 1  # first segment after one chunk conversion
    segs = [(start0, seg0)] + list(gen)
    # ordered, contiguous, non-overlapping
    pos = 0
    for start, seg in segs:
        assert start == pos
        pos += seg.shape[0]
    assert pos == T
    np.testing.assert_allclose(
        np.concatenate([s for _, s in segs], axis=0), offline, atol=1e-6)
