"""Sequence masking utilities (JAX).

TPU-native counterpart of the reference's mask helpers
(/root/reference/serenade/utils/masking.py:4,210).  All functions are pure,
shape-static, and jit-safe: masks are built from `broadcasted_iota`
comparisons instead of Python loops, so they can be traced with dynamic
(traced) length values while keeping static output shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def length_mask(lengths, maxlen: int, dtype=jnp.float32):
    """Return a `(B, maxlen)` mask with 1 at valid positions, 0 at padding.

    Equivalent to the reference `make_non_pad_mask(lengths)` (masking.py:210)
    but with a *static* `maxlen` (bucketed padding) instead of `max(lengths)`.

    Args:
        lengths: `(B,)` integer array of valid lengths (may be traced).
        maxlen: static padded length.
        dtype: output dtype (float mask by default — multiplies cleanly).
    """
    lengths = jnp.asarray(lengths)
    pos = lax.broadcasted_iota(jnp.int32, (lengths.shape[0], maxlen), 1)
    return (pos < lengths[:, None]).astype(dtype)


def make_pad_mask(lengths, maxlen: int):
    """Boolean `(B, maxlen)` mask, True at padded positions (reference
    masking.py:4 semantics)."""
    return length_mask(lengths, maxlen, dtype=jnp.bool_) == False  # noqa: E712


def make_non_pad_mask(lengths, maxlen: int):
    """Boolean `(B, maxlen)` mask, True at valid positions."""
    return length_mask(lengths, maxlen, dtype=jnp.bool_)


def segment_mask(seg_start, seg_end, maxlen: int, dtype=jnp.float32):
    """`(maxlen,)` mask, 1 inside `[seg_start, seg_end)`.

    Used for the masked-infilling objective (reference serenade.py:121-136);
    `seg_start`/`seg_end` may be traced scalars, enabling the random segment
    draw to live inside the jitted train step.
    """
    pos = lax.broadcasted_iota(jnp.int32, (maxlen, 1), 0)[:, 0]
    return ((pos >= seg_start) & (pos < seg_end)).astype(dtype)
