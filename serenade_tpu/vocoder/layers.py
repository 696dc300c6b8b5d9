"""Vocoder conv building blocks (channels-last, torch-geometry padding).

TPU-native counterparts of reference vocoder/layers/* (causal_conv.py:11,44;
residual_block.py:43-258; residual_stack.py:13; upsample.py:16-194).  The
superset is kept because vocoder checkpoints reference these block types
(vocoder/utils.py resolves generator classes by config) — HiFiGAN is the
shipped path, the rest load/convert for compatibility.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.models.layers import Conv1d, ConvTranspose1d


def leaky_relu_01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class CausalConv1d(nn.Module):
    """Left-padded conv: output at t sees inputs ≤ t (causal_conv.py:11)."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return Conv1d(
            self.features, kernel_size=self.kernel_size, dilation=self.dilation,
            padding=0, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)


class CausalConvTranspose1d(nn.Module):
    """Causal transposed conv (causal_conv.py:44): stride-s upsampling whose
    output at frame t depends only on inputs ≤ t (trailing samples cut)."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose1d(
            self.features, kernel_size=self.kernel_size, stride=self.stride,
            padding=0, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name="deconv",
        )(x)
        return y[:, : x.shape[1] * self.stride, :]


class _ConvParams(nn.Module):
    """Declares kernel/bias with Conv1d's exact naming and init — lets the
    fused resblock path own the same param tree as the conv-by-conv path
    (checkpoint compatibility either way)."""

    kernel_size: int
    cin: int
    cout: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, self.cin, self.cout), self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.cout,),
                          self.param_dtype)
        return kernel, bias


class HiFiGANResidualBlock(nn.Module):
    """Dilated conv pairs with residual adds (residual_block.py:143-258):
    per dilation d: LReLU(0.1) → k-conv(dil=d) [→ LReLU → k-conv(dil=1)]
    → +residual.

    ``backend='fused'`` runs the whole branch in one Pallas kernel that
    streams each tile through VMEM once (ops/resblock_pallas.py) —
    inference-only (no custom VJP).  'conv' chains conv1d calls (autodiff
    works; the conv backend picks mm/lax per platform).  Param trees are
    identical across backends.
    """

    kernel_size: int = 3
    channels: int = 512
    dilations: Tuple[int, ...] = (1, 3, 5)
    use_additional_convs: bool = True
    backend: str = "conv"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, c = self.kernel_size, self.channels
        w1, b1, w2, b2 = [], [], [], []
        for i in range(len(self.dilations)):
            kk, bb = _ConvParams(k, c, c, self.param_dtype,
                                 name=f"conv1_{i}")()
            w1.append(kk), b1.append(bb)
            if self.use_additional_convs:
                kk, bb = _ConvParams(k, c, c, self.param_dtype,
                                     name=f"conv2_{i}")()
                w2.append(kk), b2.append(bb)

        if self.backend == "fused":
            from serenade_tpu.ops.resblock_pallas import (
                fused_block_t, resblock_branch_pallas,
            )

            n = len(self.dilations)
            block_t = fused_block_t(n, k, c)
            if block_t:
                stack = lambda ws: jnp.stack(ws).astype(self.dtype)  # noqa: E731
                if not self.use_additional_convs:
                    w2 = [jnp.zeros_like(w1[0])] * n
                    b2 = [jnp.zeros_like(b1[0])] * n
                return resblock_branch_pallas(
                    x.astype(self.dtype), stack(w1), stack(b1), stack(w2),
                    stack(b2), kernel_size=k, dilations=tuple(self.dilations),
                    use_additional_convs=self.use_additional_convs,
                    block_t=block_t,
                    interpret=jax.default_backend() == "cpu",
                )
            # VMEM-infeasible branch (big C × big k): conv fallback below

        from serenade_tpu.models.layers import conv1d

        x = x.astype(self.dtype)
        for i, dilation in enumerate(self.dilations):
            h = leaky_relu_01(x)
            h = conv1d(h, w1[i].astype(self.dtype), b1[i].astype(self.dtype),
                       dilation=dilation,
                       padding=((k - 1) // 2 * dilation,) * 2)
            if self.use_additional_convs:
                h = leaky_relu_01(h)
                h = conv1d(h, w2[i].astype(self.dtype),
                           b2[i].astype(self.dtype), dilation=1,
                           padding=((k - 1) // 2,) * 2)
            x = x + h
        return x


class WaveNetResidualBlock(nn.Module):
    """Gated tanh/sigmoid residual block with optional conditioning
    (residual_block.py:43-141 role); returns (residual_out, skip_out)."""

    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    dilation: int = 1
    aux_channels: int = 80
    use_causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c=None):
        if self.use_causal:
            pad = (self.kernel_size - 1) * self.dilation
            h = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            h = Conv1d(self.gate_channels, kernel_size=self.kernel_size,
                       dilation=self.dilation, padding=0, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(h)
        else:
            h = Conv1d(self.gate_channels, kernel_size=self.kernel_size,
                       dilation=self.dilation, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)
        if c is not None:
            h = h + Conv1d(self.gate_channels, kernel_size=1, padding=0,
                           use_bias=False, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="aux_conv")(c)
        a, b = jnp.split(h, 2, axis=-1)
        z = jnp.tanh(a) * jax.nn.sigmoid(b)
        res = Conv1d(self.residual_channels, kernel_size=1, padding=0,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="res_conv")(z)
        skip = Conv1d(self.skip_channels, kernel_size=1, padding=0,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="skip_conv")(z)
        return (x + res) * (0.5 ** 0.5), skip


class MelGANResidualStack(nn.Module):
    """MelGAN residual stack (residual_stack.py:13)."""

    channels: int = 32
    kernel_size: int = 3
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        pad = (self.kernel_size - 1) // 2 * self.dilation
        h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        h = Conv1d(self.channels, kernel_size=self.kernel_size,
                   dilation=self.dilation, padding=0, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv1d(self.channels, kernel_size=1, padding=0, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv2")(h)
        s = Conv1d(self.channels, kernel_size=1, padding=0, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="shortcut")(x)
        return h + s


class Stretch2d(nn.Module):
    """Nearest-neighbor (time, freq) upsampling (upsample.py:16)."""

    time_scale: int
    freq_scale: int = 1

    def __call__(self, x):
        # x: (B, T, F)
        x = jnp.repeat(x, self.time_scale, axis=1)
        if self.freq_scale > 1:
            x = jnp.repeat(x, self.freq_scale, axis=2)
        return x


class UpsampleNetwork(nn.Module):
    """Stack of stretch + 2D conv smoothing (upsample.py:62)."""

    upsample_scales: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        # c: (B, T, C) -> (B, T*prod(scales), C)
        x = c[..., None]  # (B, T, C, 1) as NHWC with 1 channel
        for i, scale in enumerate(self.upsample_scales):
            x = jnp.repeat(x, scale, axis=1)
            k = 2 * scale + 1
            x = nn.Conv(1, kernel_size=(k, 1), padding=((scale, scale), (0, 0)),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{i}")(x)
        return x[..., 0]


class ConvInUpsampleNetwork(nn.Module):
    """Aux-context conv then upsampling (upsample.py:131)."""

    upsample_scales: Tuple[int, ...]
    aux_channels: int = 80
    aux_context_window: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        k = 2 * self.aux_context_window + 1
        c = Conv1d(self.aux_channels, kernel_size=k, padding=0,
                   use_bias=False, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv_in")(c)
        return UpsampleNetwork(self.upsample_scales, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="upsample")(c)
