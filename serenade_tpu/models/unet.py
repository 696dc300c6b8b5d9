"""1-D UNet flow estimator (Matcha-style), TPU-native.

Re-design of reference matcha_components/decoder.py:208-467 in channels-last
layout with static bucketed time (T must be even; buckets are multiples of
64 upstream, so halving at the single downsample level is exact — the
reference's odd-length truncation dance (decoder.py:446-447) disappears).

Structure with default ``channels=(512, 512)``:
  down0: Resnet(in→512) + TX + stride-2 conv   (T → T/2)
  down1: Resnet(512→512) + TX + k3 conv        (T/2)
  mid×2: Resnet + TX                            (T/2)
  up0:   Resnet(concat 1024→512) + TX + convT  (T/2 → T)
  up1:   Resnet(concat 1024→512) + TX + k3 conv (T)
  final: Block1D + 1x1 projection → out_channels

Style conditioning enters through SpeakerAdapter conditional LayerNorm in
every resnet block (decoder.py:91-100); the transformer blocks are pure
self-attention (see transformer.py docstring).
"""

from __future__ import annotations

import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.models.layers import (
    Conv1d,
    ConvTranspose1d,
    MaskedGroupNorm,
    QDense,
    SpeakerAdaLayerNorm,
    TimestepEmbedding,
    conv1d,
    masked_group_norm,
    mish,
    sinusoidal_time_embedding,
)
from serenade_tpu.models.transformer import BasicTransformerBlock


def default_block1d_backend() -> str:
    """'xla' everywhere — measured faster than the fused Pallas Block1D
    (ops/block1d_pallas.py) at training shapes on v5e (2026-08-17,
    docs/PROFILING.md): per-program device times B16/T512/C512 bf16 are
    fwd 116 us (xla) vs 120 us (fused) and fwd+bwd 217 vs 325 us — XLA's
    saved-activation backward beats the kernel's recompute, and chained
    fused calls additionally lose cross-block fusion (6-block chain 3.1
    vs 14.3 ms).  The kernel remains available for experimentation via
    SERENADE_BLOCK1D_BACKEND=fused."""
    forced = os.environ.get("SERENADE_BLOCK1D_BACKEND")
    if forced in ("fused", "xla"):
        return forced
    return "xla"


class _ConvParams(nn.Module):
    """Parameter twin of Conv1d (same names/shapes/inits) so Block1D can
    dispatch between fused and unfused execution over ONE param tree."""

    kernel_size: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class _NormParams(nn.Module):
    """Parameter twin of MaskedGroupNorm (names scale/bias)."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return scale, bias


class Block1D(nn.Module):
    """conv(k3) → masked GroupNorm → Mish (reference decoder.py:66-77).

    On TPU the whole block (conv tap-concat matmul + masked GroupNorm +
    Mish, forward AND backward) runs as fused Pallas kernels
    (ops/block1d_pallas.py) when the shape fits VMEM; otherwise — and on
    CPU/GPU — the equivalent unfused path runs.  Both paths share one
    parameter tree (checkpoints are backend-independent).
    """

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, t, cin = x.shape
        kernel, cbias = _ConvParams(3, self.dim_out, self.param_dtype,
                                    name="conv")(cin)
        scale, nbias = _NormParams(self.dim_out, self.param_dtype,
                                   name="norm")()
        if default_block1d_backend() == "fused":
            from serenade_tpu.ops.block1d_pallas import (
                block1d_supported, fused_block1d,
            )

            # fused kernel contract: mask is a contiguous prefix (true for
            # every mask this model builds — iota length masks, halved per
            # UNet level); non-prefix masks must take the unfused path
            if block1d_supported(b, t, cin, self.dim_out, self.groups,
                                 self.dtype):
                return fused_block1d(
                    x.astype(self.dtype), mask, kernel, cbias, scale, nbias,
                    groups=self.groups)
        h = (x * mask).astype(self.dtype)
        h = conv1d(h, kernel.astype(self.dtype), cbias.astype(self.dtype),
                   padding=(1, 1))
        h = masked_group_norm(h, mask, scale, nbias, num_groups=self.groups,
                              out_dtype=self.dtype)
        return mish(h) * mask


class ResnetBlock1D(nn.Module):
    """Two Block1Ds with a time-embedding injection, residual 1x1 conv, and
    SpeakerAdapter output conditioning (reference decoder.py:80-101)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, t_emb, spk):
        h = Block1D(self.dim_out, groups=self.groups, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="block1")(x, mask)
        t = QDense(self.dim_out, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="time_mlp")(mish(t_emb))
        h = h + t[:, None, :]
        h = Block1D(self.dim_out, groups=self.groups, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="block2")(h, mask)
        res = Conv1d(self.dim_out, kernel_size=1, padding=0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="res_conv")(x * mask)
        out = h + res
        out = SpeakerAdaLayerNorm(self.dim_out, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="speaker_adapter")(out, spk)
        return out


class Decoder(nn.Module):
    """UNet flow estimator. Inputs channels-last.

    Call: ``(x, mask, mu, t, spk) -> v`` where
      x    (B, T, out_channels)   current flow state,
      mask (B, T, 1)              validity,
      mu   (B, T, in_channels - out_channels) conditioning stack,
      t    (B,) or scalar         flow time in [0, 1],
      spk  (B, spk_dim)           style embedding.
    """

    in_channels: int          # conditioning + target dims combined
    out_channels: int
    channels: Tuple[int, ...] = (512, 512)
    attention_head_dim: int = 512
    num_heads: int = 4
    num_mid_blocks: int = 2
    n_blocks: int = 1
    dropout: float = 0.05
    act_fn: str = "snake"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mu, t, spk, deterministic: bool = True):
        b, T, _ = x.shape
        assert T % 2 == 0, "bucketed time must be even for the UNet downsample"
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        t_emb = sinusoidal_time_embedding(t, self.in_channels)
        t_emb = TimestepEmbedding(self.channels[0] * 4, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="time_mlp")(t_emb)

        h = jnp.concatenate([x, mu], axis=-1).astype(self.dtype)

        def tx(h, m2d, name, dim):
            for i in range(self.n_blocks):
                h = BasicTransformerBlock(
                    dim=dim,
                    num_attention_heads=self.num_heads,
                    attention_head_dim=self.attention_head_dim,
                    dropout=self.dropout,
                    activation_fn=self.act_fn,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"{name}_tx{i}",
                )(h, key_mask=m2d, style=spk, deterministic=deterministic)
            return h

        masks = [mask]
        hiddens = []
        # ----- down path -----
        for i, ch in enumerate(self.channels):
            is_last = i == len(self.channels) - 1
            m = masks[-1]
            h = ResnetBlock1D(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"down{i}_resnet")(h, m, t_emb, spk)
            h = tx(h, m[:, :, 0], f"down{i}", ch)
            hiddens.append(h)
            if not is_last:
                h = Conv1d(ch, kernel_size=3, stride=2, padding=1,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"down{i}_downsample")(h * m)
                masks.append(m[:, ::2, :])
            else:
                h = Conv1d(ch, kernel_size=3, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"down{i}_downsample")(h * m)

        # ----- mid -----
        m = masks[-1]
        for i in range(self.num_mid_blocks):
            h = ResnetBlock1D(self.channels[-1], dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"mid{i}_resnet")(h, m, t_emb, spk)
            h = tx(h, m[:, :, 0], f"mid{i}", self.channels[-1])

        # ----- up path -----
        up_channels = tuple(reversed(self.channels)) + (self.channels[0],)
        for i in range(len(up_channels) - 1):
            is_last = i == len(up_channels) - 2
            ch = up_channels[i + 1]
            m = masks.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock1D(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"up{i}_resnet")(h, m, t_emb, spk)
            h = tx(h, m[:, :, 0], f"up{i}", ch)
            if not is_last:
                h = ConvTranspose1d(ch, kernel_size=4, stride=2, padding=1,
                                    dtype=self.dtype, param_dtype=self.param_dtype,
                                    name=f"up{i}_upsample")(h * m)
            else:
                h = Conv1d(ch, kernel_size=3, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"up{i}_upsample")(h * m)

        final_mask = mask
        h = Block1D(up_channels[-1], dtype=self.dtype, param_dtype=self.param_dtype,
                    name="final_block")(h, final_mask)
        out = Conv1d(self.out_channels, kernel_size=1, padding=0,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="final_proj")(h * final_mask)
        return (out * final_mask).astype(jnp.float32)
