"""Long-form conversion: overlapped chunking with crossfaded stitching.

The training distribution caps utterances at 3000 frames (collater drop,
reference collaters/ssc.py:54), so arbitrarily long sources at inference
leave the model's regime AND grow the packed attention quadratically.
This op splits frame-aligned feature dicts into overlapping chunks, runs a
caller-supplied per-chunk conversion, and linearly crossfades the
overlapping mel regions — seamless long-form output with bounded compute
per chunk (a capability the reference lacks entirely).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np


def split_chunks(n_frames: int, chunk: int, overlap: int) -> List[tuple]:
    """[(start, end), ...] covering [0, n_frames) with `overlap` shared
    frames between neighbors."""
    if n_frames <= chunk:
        return [(0, n_frames)]
    step = chunk - overlap
    starts = list(range(0, n_frames - overlap, step))
    spans = []
    for s in starts:
        e = min(s + chunk, n_frames)
        spans.append((s, e))
        if e == n_frames:
            break
    return spans


def convert_in_chunks(
    feats: Dict[str, np.ndarray],
    convert_fn: Callable[[Dict[str, np.ndarray]], np.ndarray],
    chunk_frames: int = 2048,
    overlap_frames: int = 256,
) -> np.ndarray:
    """Run ``convert_fn`` on overlapping windows of the frame-aligned
    feature dict and crossfade the outputs.

    Args:
        feats: dict of (T, C) arrays (all same T).
        convert_fn: maps a chunked feature dict -> (t, C_out) mel.
    """
    lengths = {k: v.shape[0] for k, v in feats.items()}
    n = min(lengths.values())
    spans = split_chunks(n, chunk_frames, overlap_frames)
    if len(spans) == 1:
        return convert_fn(feats)

    out = None
    prev_end = 0
    for (s, e) in spans:
        chunk_feats = {k: v[s:e] for k, v in feats.items()}
        mel = np.asarray(convert_fn(chunk_feats))
        if out is None:
            out = mel
            prev_end = e
            continue
        ov = prev_end - s
        if ov > 0:
            w = np.linspace(0.0, 1.0, ov, dtype=mel.dtype)[:, None]
            out[-ov:] = out[-ov:] * (1.0 - w) + mel[:ov] * w
            out = np.concatenate([out, mel[ov:]], axis=0)
        else:
            out = np.concatenate([out, mel], axis=0)
        prev_end = e
    return out
