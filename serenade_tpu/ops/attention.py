"""Multi-head attention compute op.

Two interchangeable backends behind one functional interface:

* ``xla``   — einsum attention with f32 softmax; XLA fuses the mask add and
  scaling. Correct for any shape; used on CPU test meshes and as reference.
* ``flash`` — Pallas TPU flash-attention kernel (serenade_tpu.ops.flash),
  blockwise online-softmax, no (T, T) materialization in HBM. Used
  automatically on TPU for long sequences where it wins.

Unlike the reference (which passes a 0/1 mask straight to SDPA as an
*additive* bias — i.e. padding is never actually masked, see
matcha_components/transformer.py:292-301 + diffusers semantics), padded key
positions here receive -inf bias: real masking.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# 'auto' dispatches the flash kernel from this sequence length up.  Set
# from DEVICE-TIME profiles of the full conversion program (profiler trace,
# see docs/PROFILING.md), not from standalone micro-dispatches — through the
# axon tunnel every dispatch pays a ~2.3 ms floor that swamps sub-ms
# kernels and once inverted this threshold's sign.
FLASH_MIN_T = 2048

# The B=1 threshold above under-dispatches flash at TRAINING batches: the
# f32 score tensor XLA materializes (fwd AND bwd) scales as B·H·T², so at
# B=16 the crossover sits far below T=2048 (docs/PROFILING.md "Attention
# crossover is batch-dependent").  When set, 'auto' also dispatches flash
# once B·H·Tq·Tk·4 bytes reach this bound (square self-attention only —
# the flash kernel's tiling assumes Tq == Tk here).  None keeps the pure
# T-gate until the real-geometry probe (scripts/tpu_attn_trainshape_
# probe.py) lands a measured value.
FLASH_MIN_SCORE_BYTES = None


def _xla_attention(q, k, v, key_mask, scale):
    """q,k,v: (B, H, T, D); key_mask: (B, Tk) float 1=valid or None."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if key_mask is not None:
        bias = (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def multi_head_attention(
    q,
    k,
    v,
    *,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
):
    """Scaled dot-product attention over packed head tensors.

    Args:
        q: ``(B, Tq, H*D)``.
        k, v: ``(B, Tk, H*D)``.
        num_heads: H.
        key_mask: optional ``(B, Tk)`` validity mask (1=valid).
        backend: ``auto`` | ``xla`` | ``flash``.

    Returns:
        ``(B, Tq, H*D)``.
    """
    b, tq, hd = q.shape
    tk = k.shape[1]
    d = hd // num_heads
    scale = d ** -0.5

    def split(x, t):
        return x.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, tq), split(k, tk), split(v, tk)

    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        big_t = tq >= FLASH_MIN_T
        big_scores = (FLASH_MIN_SCORE_BYTES is not None
                      and b * num_heads * tq * tk * 4
                      >= FLASH_MIN_SCORE_BYTES)
        backend = "flash" if (
            on_tpu and (big_t or big_scores) and tq == tk and d % 128 == 0
        ) else "xla"

    if backend == "flash":
        from serenade_tpu.ops.flash_pallas import flash_attention_pallas

        out = flash_attention_pallas(qh, kh, vh, key_mask, scale)
    elif backend == "flash_scan":
        from serenade_tpu.ops.flash import flash_attention

        out = flash_attention(qh, kh, vh, key_mask=key_mask, scale=scale)
    else:
        out = _xla_attention(qh, kh, vh, key_mask, scale)

    return out.transpose(0, 2, 1, 3).reshape(b, tq, hd)


def seq_sharded_attention(
    q,
    k,
    v,
    *,
    num_heads: int,
    mesh,
    seq_axis: str = "seq",
    key_mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
):
    """Context-parallel attention: queries sharded on TIME over
    ``seq_axis``; K/V replicated.

    Attention rows are independent given full K/V, so q-slab sharding is
    exact (no ring/online-softmax machinery needed at this model's scale):
    per-device score memory drops |seq|-fold, which lifts packed ref+src
    sequences past the single-chip (T, T) wall.  The reference has no
    sequence parallelism at all (SURVEY §2.3) — its packed inference is
    capped by one GPU's memory (serenade.py:202).

    Inside each shard the regular backend dispatch applies (the flash
    kernel requires tq == tk and is skipped automatically for slabs).
    """
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    q_spec = P(None, seq_axis, None)
    rep = P()

    fn = partial(multi_head_attention, num_heads=num_heads, backend=backend)

    if key_mask is None:
        return shard_map(
            lambda qs, ks, vs: fn(qs, ks, vs),
            mesh=mesh, in_specs=(q_spec, rep, rep), out_specs=q_spec,
        )(q, k, v)
    return shard_map(
        lambda qs, ks, vs, m: fn(qs, ks, vs, key_mask=m),
        mesh=mesh, in_specs=(q_spec, rep, rep, rep), out_specs=q_spec,
    )(q, k, v, key_mask)
