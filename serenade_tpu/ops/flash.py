"""Memory-efficient (flash) attention for TPU.

Blockwise online-softmax attention: K/V are processed in chunks so the
(T, T) score matrix never materializes in HBM.  The current implementation
expresses the blocking with ``lax.scan`` and lets XLA pipeline it; a Pallas
kernel (``flash_pallas.py``) replaces it on TPU for the hot shapes.

All accumulation is f32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

_NEG_INF = -1e30


def flash_attention(
    q,
    k,
    v,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_k: int = 512,
):
    """Online-softmax attention.

    Args:
        q, k, v: ``(B, H, T, D)``.
        key_mask: optional ``(B, Tk)`` with 1 = valid.
        scale: logit scale; defaults to ``D**-0.5``.
        block_k: K/V chunk length (Tk must be padded to a multiple by caller
            or via the internal pad below).

    Returns:
        ``(B, H, Tq, D)`` in q's dtype.
    """
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = d ** -0.5

    # pad keys to a block multiple; padded keys are masked off
    rem = (-tk) % block_k
    if rem:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, rem), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, rem), (0, 0)))
        pad_mask = jnp.ones((b, tk), dtype=jnp.float32)
        key_mask = pad_mask if key_mask is None else key_mask.astype(jnp.float32)
        key_mask = jnp.pad(key_mask, ((0, 0), (0, rem)))
    tk_p = tk + rem
    n_blocks = tk_p // block_k

    kb = k.reshape(b, h, n_blocks, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(b, h, n_blocks, block_k, d).transpose(2, 0, 1, 3, 4)
    if key_mask is not None:
        mb = key_mask.reshape(b, n_blocks, block_k).transpose(1, 0, 2)
    else:
        mb = None

    qf = q.astype(jnp.float32) * scale

    def step(carry, blk):
        acc, row_max, row_sum = carry
        if mb is None:
            k_blk, v_blk = blk
            bias = 0.0
        else:
            k_blk, v_blk, m_blk = blk
            bias = (1.0 - m_blk)[:, None, None, :] * _NEG_INF
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + bias
        blk_max = jnp.max(s, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(s - new_max[..., None])
        new_sum = row_sum * correction + jnp.sum(p, axis=-1)
        new_acc = acc * correction[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return (new_acc, new_max, new_sum), None

    init = (
        jnp.zeros((b, h, tq, d), jnp.float32),
        jnp.full((b, h, tq), _NEG_INF, jnp.float32),
        jnp.zeros((b, h, tq), jnp.float32),
    )
    xs = (kb, vb) if mb is None else (kb, vb, mb)
    (acc, _, row_sum), _ = lax.scan(step, init, xs)
    out = acc / jnp.maximum(row_sum[..., None], 1e-30)
    return out.astype(q.dtype)
