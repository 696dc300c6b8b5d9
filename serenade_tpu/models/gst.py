"""Global Style Token (GST) encoder, TPU-native.

Re-design of reference modules/gst/style_encoder.py:16-276 (GST-Tacotron):

* ReferenceEncoder: 6 stride-2 conv2d + norm + ReLU over the (time, mel)
  plane, then a GRU whose final hidden state is the reference embedding.
  TPU changes: channels-last NHWC convs; GroupNorm(masked) instead of
  BatchNorm2d (no cross-replica batch statistics needed, padding-invariant,
  and identical role of per-channel normalization); the GRU is a masked
  `nn.scan` that freezes the carry at padded steps, so the returned state is
  the hidden at each sequence's true last frame (the reference runs its GRU
  straight over padding — a padding-dependent behavior we do not replicate).
* StyleTokenLayer: 50 learnable tokens attended by the reference embedding
  with 4-head attention; returns a (B, gst_token_dim) style vector.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.ops.attention import multi_head_attention


class MaskedGRU(nn.Module):
    """Unidirectional GRU over (B, T, C) with per-step carry freezing.

    Runs as a lifted scan in f32 (small state; latency-bound not
    FLOP-bound). Returns the hidden state at each sequence's last valid
    step.
    """

    hidden: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        """x: (B, T, C); mask: (B, T) 1=valid. Returns (B, hidden)."""
        b = x.shape[0]
        cell = nn.GRUCell(features=self.hidden, param_dtype=self.param_dtype,
                          dtype=jnp.float32)

        def step(cell, carry, inp):
            xt, mt = inp
            new_carry, _ = cell(carry, xt)
            keep = mt[:, None]
            carry = jax.tree_util.tree_map(
                lambda n, o: n * keep + o * (1.0 - keep), new_carry, carry
            )
            return carry, ()

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
        )
        init = cell.initialize_carry(jax.random.key(0), (b, x.shape[-1]))
        carry, _ = scan(cell, init, (x.astype(jnp.float32),
                                     mask.astype(jnp.float32)))
        return carry


class MaskedGroupNorm2d(nn.Module):
    """GroupNorm over (time, freq, C/group) with padded time excluded —
    keeps the style embedding invariant to bucket padding (the reference's
    BatchNorm2d statistics include padding)."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_len):
        b, t, f, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        xf = x.astype(jnp.float32).reshape(b, t, f, g, c // g)
        m = (jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
             < t_len[:, None]).astype(jnp.float32)[:, :, None, None, None]
        denom = jnp.maximum(
            jnp.sum(m, axis=(1, 2, 3, 4), keepdims=True) * f * (c // g), 1.0
        )
        mean = jnp.sum(xf * m, axis=(1, 2, 4), keepdims=True) / denom
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 2, 4),
                      keepdims=True) / denom
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(b, t, f, c) * scale + bias
        return y.astype(self.dtype)


class FrozenBatchNorm2d(nn.Module):
    """Inference-mode BatchNorm2d: affine transform with running stats.
    Used in torch-checkpoint-compatibility mode (`norm_type='frozen_batch'`)
    where converted running statistics must be applied exactly."""

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        var = self.param("var", nn.initializers.ones, (self.features,),
                         self.param_dtype)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        inv = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        return x * inv + (bias - mean * scale
                          * jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)


class ReferenceEncoder(nn.Module):
    idim: int = 80
    conv_chans: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    kernel_size: int = 3
    stride: int = 2
    gru_units: int = 128
    norm_type: str = "masked_group"  # or "frozen_batch" (torch-ckpt compat)
    pooling: str = "gru"  # or "attention": masked attention pooling — no
    #                        sequential scan, the SURVEY §7.4 latency-cliff
    #                        alternative (parity default stays GRU)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, lengths=None):
        """mel: (B, T, idim). Returns (B, gru_units)."""
        b, T, _ = mel.shape
        x = mel.astype(self.dtype)[..., None]  # NHWC: (B, T, mel, 1)
        t_len = (
            jnp.asarray(lengths) if lengths is not None
            else jnp.full((b,), T, jnp.int32)
        )
        for i, ch in enumerate(self.conv_chans):
            x = nn.Conv(
                ch,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i}",
            )(x)
            t_len = (t_len + self.stride - 1) // self.stride  # ceil-div per level
            if self.norm_type == "frozen_batch":
                x = FrozenBatchNorm2d(
                    ch, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"norm{i}",
                )(x)
            else:
                x = MaskedGroupNorm2d(
                    num_groups=min(8, ch), dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"norm{i}",
                )(x, t_len)
            x = nn.relu(x)
        bt = x.shape[1]
        feats = x.reshape(b, bt, -1)  # (B, T', freq'*ch)
        step_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, bt), 1) < t_len[:, None]
        ).astype(jnp.float32)
        if self.pooling == "attention":
            # masked single-query attention pooling: O(T') parallel ops
            # instead of a sequential scan
            h = nn.Dense(self.gru_units, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pool_proj")(feats)
            logits = nn.Dense(1, dtype=jnp.float32,
                              param_dtype=self.param_dtype,
                              name="pool_score")(feats)[..., 0]
            logits = jnp.where(step_mask > 0, logits, -1e30)
            w = jax.nn.softmax(logits, axis=1)
            return jnp.einsum("bt,btc->bc", w.astype(h.dtype), h)
        return MaskedGRU(self.gru_units, param_dtype=self.param_dtype)(
            feats, step_mask
        )


class StyleTokenLayer(nn.Module):
    ref_embed_dim: int = 128
    gst_tokens: int = 50
    gst_token_dim: int = 256
    gst_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_embs):
        """ref_embs: (B, ref_embed_dim) -> (B, gst_token_dim)."""
        b = ref_embs.shape[0]
        token_dim = self.gst_token_dim // self.gst_heads
        tokens = self.param(
            "gst_embs", nn.initializers.normal(1.0),
            (self.gst_tokens, token_dim), self.param_dtype,
        )
        keys = jnp.tanh(tokens)[None].repeat(b, axis=0)  # (B, N, token_dim)
        q = nn.Dense(self.gst_token_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_q")(
            ref_embs[:, None, :].astype(self.dtype))
        k = nn.Dense(self.gst_token_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_k")(
            keys.astype(self.dtype))
        v = nn.Dense(self.gst_token_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_v")(
            keys.astype(self.dtype))
        out = multi_head_attention(q, k, v, num_heads=self.gst_heads)
        out = nn.Dense(self.gst_token_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="linear_out")(out)
        return out[:, 0, :]


class StyleEncoder(nn.Module):
    """mel (B, T, idim) -> style embedding (B, gst_token_dim)."""

    idim: int = 80
    gst_tokens: int = 50
    gst_token_dim: int = 256
    gst_heads: int = 4
    conv_chans: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    gru_units: int = 128
    norm_type: str = "masked_group"
    pooling: str = "gru"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, lengths=None):
        ref = ReferenceEncoder(
            idim=self.idim,
            conv_chans=self.conv_chans,
            gru_units=self.gru_units,
            norm_type=self.norm_type,
            pooling=self.pooling,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="ref_enc",
        )(mel, lengths)
        return StyleTokenLayer(
            ref_embed_dim=self.gru_units,
            gst_tokens=self.gst_tokens,
            gst_token_dim=self.gst_token_dim,
            gst_heads=self.gst_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="stl",
        )(ref)
