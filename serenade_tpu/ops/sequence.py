"""Static-shape sequence surgery ops.

The reference concatenates reference+source features along time with
Python-level dynamic shapes (serenade.py:199-219), which would force a
recompile per length pair under XLA.  These helpers express the same
surgery with static bucketed shapes + traced offsets
(`dynamic_update_slice`), so one compiled program serves every length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pack_pair_time(ref, ref_lengths, src, src_lengths):
    """Concatenate per-sample valid prefixes of ``ref`` and ``src`` in time.

    Args:
        ref: (B, Tr, C) bucket-padded reference features.
        ref_lengths: (B,) valid lengths of ref.
        src: (B, Ts, C) bucket-padded source features.
        src_lengths: (B,) valid lengths of src.

    Returns:
        packed: (B, Tr+Ts, C) with ref[0:rl] immediately followed by
            src[0:Ts] (source padding lands after the valid region).
        total_lengths: (B,) = ref_lengths + src_lengths.
    """
    b, tr, c = ref.shape
    ts = src.shape[1]
    out = jnp.zeros((b, tr + ts, c), ref.dtype)

    def place(out_row, ref_row, rl, src_row):
        out_row = lax.dynamic_update_slice(out_row, ref_row, (0, 0))
        return lax.dynamic_update_slice(out_row, src_row, (rl, 0))

    packed = jax.vmap(place)(out, ref, ref_lengths, src)
    return packed, ref_lengths + src_lengths


def unpack_suffix_time(packed, offsets, out_len: int):
    """Extract per-sample windows ``packed[b, offsets[b] : offsets[b]+out_len]``
    (the source part written by ``pack_pair_time``)."""

    def take(row, off):
        return lax.dynamic_slice(row, (off, 0), (out_len, row.shape[-1]))

    return jax.vmap(take)(packed, offsets)
