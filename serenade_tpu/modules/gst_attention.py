"""Multi-head attention variants of the GST module family.

Counterpart of reference modules/gst/attention.py:56-494.  The reference
carries an ESPnet MultiHeadedAttention with four execution paths (SDPA /
flash fixed / flash varlen / legacy matmul) plus two relative-position
variants that the SSC path never calls.  On TPU one implementation serves
all shapes (serenade_tpu.ops.attention picks XLA vs Pallas-flash), so this
module provides:

* ``MultiHeadedAttention`` — dimension-adapting q/k/v projections (the
  StyleTokenLayer subclass behavior, style_encoder.py:255-276);
* ``RelPositionMultiHeadedAttention`` — Transformer-XL relative position
  attention with the u/v bias vectors and the rel-shift trick
  (attention.py:398-494);
* ``LegacyRelPositionMultiHeadedAttention`` — the old ESPnet variant whose
  positional matrix is indexed left-to-right without the shift
  (attention.py:303-397).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.ops.attention import multi_head_attention


class MultiHeadedAttention(nn.Module):
    n_head: int = 4
    n_feat: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_mask=None):
        dense = lambda name: nn.Dense(  # noqa: E731
            self.n_feat, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        q = dense("linear_q")(query)
        k = dense("linear_k")(key)
        v = dense("linear_v")(value)
        out = multi_head_attention(q, k, v, num_heads=self.n_head,
                                   key_mask=key_mask)
        return dense("linear_out")(out)


class RelPositionMultiHeadedAttention(nn.Module):
    """Self-attention with relative positional encoding (u/v bias form)."""

    n_head: int = 4
    n_feat: int = 256
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, key_mask: Optional[jnp.ndarray] = None):
        """x: (B, T, C); pos_emb: (1, 2T-1, C) relative positions."""
        b, t, _ = x.shape
        h = self.n_head
        d = self.n_feat // h
        dense = lambda name: nn.Dense(  # noqa: E731
            self.n_feat, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        q = dense("linear_q")(x).reshape(b, t, h, d)
        k = dense("linear_k")(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = dense("linear_v")(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        p = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_pos")(
            pos_emb
        ).reshape(pos_emb.shape[0], -1, h, d).transpose(0, 2, 1, 3)

        u = self.param("pos_bias_u", nn.initializers.zeros, (h, d),
                       self.param_dtype)
        vb = self.param("pos_bias_v", nn.initializers.zeros, (h, d),
                        self.param_dtype)

        q_u = (q + u).transpose(0, 2, 1, 3)   # (B, H, T, d)
        q_v = (q + vb).transpose(0, 2, 1, 3)
        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, p,
                        preferred_element_type=jnp.float32)  # (B,H,T,2T-1)
        # relative index: position p = (k - q) + (T - 1)
        idx = jnp.arange(t)[None, :] - jnp.arange(t)[:, None] + t - 1  # (T,T)
        rel = jnp.take_along_axis(
            bd, jnp.broadcast_to(idx[None, None], (b, h, t, t)), axis=3
        )  # rel[b,h,q,k] = bd[b,h,q,idx[q,k]]
        scores = (ac + rel) * (d ** -0.5)
        if key_mask is not None:
            scores = scores + (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * -1e30
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.n_feat)
        return dense("linear_out")(out)


class LegacyRelPositionMultiHeadedAttention(RelPositionMultiHeadedAttention):
    """Legacy ESPnet variant: pos_emb has length T (left-aligned), no
    shift."""

    @nn.compact
    def __call__(self, x, pos_emb, key_mask: Optional[jnp.ndarray] = None):
        b, t, _ = x.shape
        h = self.n_head
        d = self.n_feat // h
        dense = lambda name: nn.Dense(  # noqa: E731
            self.n_feat, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        q = dense("linear_q")(x).reshape(b, t, h, d)
        k = dense("linear_k")(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        v = dense("linear_v")(x).reshape(b, t, h, d).transpose(0, 2, 1, 3)
        p = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_pos")(
            pos_emb
        ).reshape(pos_emb.shape[0], -1, h, d).transpose(0, 2, 1, 3)
        u = self.param("pos_bias_u", nn.initializers.zeros, (h, d),
                       self.param_dtype)
        vb = self.param("pos_bias_v", nn.initializers.zeros, (h, d),
                        self.param_dtype)
        ac = jnp.einsum("bhqd,bhkd->bhqk", (q + u).transpose(0, 2, 1, 3), k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,bhkd->bhqk", (q + vb).transpose(0, 2, 1, 3),
                        p[:, :, :t], preferred_element_type=jnp.float32)
        scores = (ac + bd) * (d ** -0.5)
        if key_mask is not None:
            scores = scores + (
                1.0 - key_mask.astype(jnp.float32)
            )[:, None, None, :] * -1e30
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.n_feat)
        return dense("linear_out")(out)
