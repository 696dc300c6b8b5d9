"""Batch collation with bucketed static-shape padding.

Counterpart of reference collaters/ssc.py:12-152 with one TPU-critical
change: instead of padding to the exact batch max (a new XLA program per
unique max length), lengths are padded up to the next *bucket* — a multiple
of ``bucket_multiple`` frames (default 64: keeps the UNet's stride-2 level
and the GST's six stride-2 levels exact).  A handful of buckets ⇒ a handful
of compiled programs, cached after the first epoch.

Reference semantics kept: batch sorted by length descending, utterances of
``max_frames`` (3000) or more dropped (collaters/ssc.py:53-54), zero
padding, keys ``xs/lens/ys/louds/scores`` (+``f0_flucs``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from serenade_tpu.config import register


def bucket_length(n: int, multiple: int = 64, min_len: int = 64) -> int:
    return max(min_len, ((n + multiple - 1) // multiple) * multiple)


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (and >= 1)."""
    return 1 << max(n - 1, 0).bit_length()


def pad_pow2(seq: list) -> list:
    """Pad a non-empty sequence to the next power-of-two length by
    repeating its last element (callers drop the padding's results).

    Bounds the compiled-program count per bucket to log2(max_batch)
    sizes: online serving sees every group size 1..max_batch, and a fresh
    program per distinct size stalls live traffic for minutes on
    slow-compile links."""
    seq = list(seq)
    return seq + [seq[-1]] * (next_pow2(len(seq)) - len(seq))


def pad_to(x: np.ndarray, length: int) -> np.ndarray:
    pad = length - x.shape[0]
    if pad <= 0:
        return x[:length]
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths)


@register("collater")
class SSCCollater:
    FEATURE_KEYS = {"xs": "hubert", "ys": "logmel", "louds": "loud",
                    "scores": "score"}

    def __init__(self, max_frames: int = 3000, bucket_multiple: int = 64,
                 pad_batch_to: int | None = None,
                 pad_frames_to: int | None = None,
                 host_dtype: str | None = None):
        """``host_dtype``: numpy dtype for the feature arrays the collater
        emits (default float32).  "bfloat16" halves collation + host→device
        transfer bytes.  Conditioning inputs lose nothing (the model's
        matmuls round them to bf16 at the first Dense anyway), but the cast
        also quantizes the regression TARGET ``ys``/logmel and the
        loss-weighting inputs, so the CFM loss regresses onto bf16 targets —
        a real (if tiny, ~3e-3 relative) precision change beyond
        matmul-input rounding.  Keep the default f32 if exact targets
        matter more than host bandwidth."""
        self.max_frames = max_frames
        self.bucket_multiple = bucket_multiple
        self.pad_batch_to = pad_batch_to
        # pad_frames_to pins EVERY batch's time axis to one fixed length
        # (longer items truncate): ONE compiled train program instead of
        # one per occupied 64-frame bucket — decisive on slow-compile
        # tunneled links where each big-program compile costs minutes
        self.pad_frames_to = pad_frames_to
        if host_dtype is None or host_dtype == "float32":
            self.host_dtype = np.float32
        elif str(host_dtype) == "bfloat16":
            import ml_dtypes

            self.host_dtype = ml_dtypes.bfloat16
        else:
            self.host_dtype = np.dtype(host_dtype).type

    def _filter_sort(self, batch: Sequence[dict]) -> List[dict]:
        kept = [b for b in batch if b["hubert"].shape[0] < self.max_frames]
        return sorted(kept, key=lambda b: -b["hubert"].shape[0])

    def __call__(self, batch: Sequence[dict]) -> Dict[str, np.ndarray]:
        items = self._filter_sort(batch)
        if not items:
            raise ValueError("collater received an empty batch after filtering")
        lens = np.array([b["hubert"].shape[0] for b in items], np.int32)
        if self.pad_frames_to:
            T = int(self.pad_frames_to)
            lens = np.minimum(lens, T)
        else:
            T = bucket_length(int(lens.max()), self.bucket_multiple)

        out = {"lens": lens}
        for out_key, src_key in self.FEATURE_KEYS.items():
            # preallocate + row writes: one copy per feature instead of
            # np.pad + np.stack's two (the collater is on the input hot
            # path — bench.py::bench_loader)
            first = np.asarray(items[0][src_key])
            arr = np.empty((len(items), T) + first.shape[1:], self.host_dtype)
            for j, b in enumerate(items):
                x = np.asarray(b[src_key])
                n = min(x.shape[0], T)
                arr[j, :n] = x[:T]  # row write casts to host_dtype in place
                arr[j, n:] = 0.0  # zero only the pad tail, not the buffer
            out[out_key] = arr
        # pad the batch axis too when a fixed batch size is requested
        # (keeps the program count at one per bucket on multi-chip meshes)
        if self.pad_batch_to and len(items) < self.pad_batch_to:
            nb = self.pad_batch_to - len(items)
            out["lens"] = np.concatenate([lens, np.zeros(nb, np.int32)])
            for k in self.FEATURE_KEYS:
                pad_block = np.zeros((nb,) + out[k].shape[1:], self.host_dtype)
                out[k] = np.concatenate([out[k], pad_block])
        return out


@register("collater")
class SSCCollaterNew(SSCCollater):
    FEATURE_KEYS = dict(SSCCollater.FEATURE_KEYS, f0_flucs="f0_fluc")
