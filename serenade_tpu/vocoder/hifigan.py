"""HiFiGAN generator + discriminator family (flax, channels-last).

TPU-native counterpart of reference vocoder/models/hifigan.py:21-881.
Generator: input k7 conv → 4 × [LReLU(0.1) → stride-s ConvTranspose →
3 multi-kernel dilated residual blocks averaged] → LReLU → k7 conv → tanh
(hifigan.py:171-190).  Upsample scales (8,8,2,2) turn 10 ms mel frames into
24 kHz samples (hop 240... note the shipped GTSinger vocoder uses scales
whose product equals hop_size; the converter reads them from its config).

The weight norm of the torch checkpoints is *folded* at conversion time —
the reference itself removes weight norm before inference
(vocoder/vocoder.py:38), so inference numerics are identical with plain
kernels and TPU skips the per-step renormalization.

Discriminators (Period/MultiPeriod/Scale/MultiScale/MS+MP,
hifigan.py:287-881) are included for completeness and future vocoder
training; the SSC pipeline itself only loads the generator
(vocoder/utils.py:45-47).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from serenade_tpu.models.layers import Conv1d, ConvTranspose1d
from serenade_tpu.vocoder.layers import HiFiGANResidualBlock, leaky_relu_01


class HiFiGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    use_additional_convs: bool = True
    resblock_backend: str = "conv"  # 'fused' = Pallas branch kernel (infer)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        """c: (B, T, in_channels) mel -> (B, T * prod(scales), out_channels)."""
        x = Conv1d(self.channels, kernel_size=self.kernel_size,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="input_conv")(c.astype(self.dtype))
        for i, (scale, k_up) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            ch = self.channels // (2 ** (i + 1))
            x = leaky_relu_01(x)
            x = ConvTranspose1d(
                ch, kernel_size=k_up, stride=scale,
                padding=scale // 2 + scale % 2, output_padding=scale % 2,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"upsample_{i}",
            )(x)
            acc = None
            for j, (k_res, dils) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                h = HiFiGANResidualBlock(
                    kernel_size=k_res, channels=ch, dilations=tuple(dils),
                    use_additional_convs=self.use_additional_convs,
                    backend=self.resblock_backend,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"block_{i}_{j}",
                )(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        # output stage uses torch's default LeakyReLU slope 0.01, unlike the
        # 0.1 used elsewhere (reference hifigan.py:141-145 keeps the official
        # implementation's inconsistency; we preserve it for ckpt parity)
        x = nn.leaky_relu(x, 0.01)
        x = Conv1d(self.out_channels, kernel_size=self.kernel_size,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="output_conv")(x)
        return jnp.tanh(x)


class PeriodDiscriminator(nn.Module):
    """Reshapes the waveform into (T/p, p) and runs strided 2D convs.

    Geometry matches reference hifigan.py:287-400 exactly: one conv per
    ``downsample_scales`` entry with kernel (k0, 1) and per-layer stride,
    channels starting at ``channels`` and growing ×4 capped at
    ``max_downsample_channels`` (32→128→512→1024→1024 by default), then
    an output conv of kernel (k1-1, 1) (reference :352-359 — the odd
    ``kernel_sizes[1] - 1`` is the reference's own quirk, preserved).
    Weight norm is omitted: these discriminators train from scratch (no
    released checkpoint to match) and the generator's own training was
    measured stable without it.
    """

    period: int = 3
    kernel_sizes: Tuple[int, int] = (5, 3)
    channels: int = 32
    downsample_scales: Tuple[int, ...] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 1)
        b, t, _ = x.shape
        pad = (-t) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1)  # (B, T/p, p, 1) NHWC
        fmaps = []
        k0, k1 = self.kernel_sizes
        ch = self.channels
        for i, s in enumerate(self.downsample_scales):
            x = nn.Conv(ch, kernel_size=(k0, 1), strides=(s, 1),
                        padding=((((k0 - 1) // 2),) * 2, (0, 0)),
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv{i}")(x)
            x = leaky_relu_01(x)
            fmaps.append(x)
            ch = min(ch * 4, self.max_downsample_channels)
        x = nn.Conv(1, kernel_size=(k1 - 1, 1),
                    padding=((((k1 - 1) // 2),) * 2, (0, 0)),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_post")(x)
        fmaps.append(x)
        return x, fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, p in enumerate(self.periods):
            outs.append(
                PeriodDiscriminator(period=p, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"period{i}")(x)
            )
        return outs


class ScaleDiscriminator(nn.Module):
    """Stacked grouped 1D convs on (possibly pooled) waveforms.

    Geometry matches reference hifigan.py:473-584 exactly: a k15 input
    conv, one grouped k41 conv per ``downsample_scales`` entry with
    channels doubling (capped) and groups 4→16 (128→128→256→512→1024→1024
    by default), then k5 + k3 output convs.  Weight/spectral norm omitted
    (see PeriodDiscriminator)."""

    kernel_sizes: Tuple[int, ...] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    downsample_scales: Tuple[int, ...] = (2, 2, 4, 4, 1)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fmaps = []
        x = Conv1d(self.channels, kernel_size=self.kernel_sizes[0],
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="conv0")(x)
        x = leaky_relu_01(x)
        fmaps.append(x)
        out_ch, groups = self.channels, 4
        for i, s in enumerate(self.downsample_scales):
            x = _grouped_conv1d(out_ch, self.kernel_sizes[1], s, groups,
                                self.dtype, self.param_dtype, f"down{i}")(x)
            x = leaky_relu_01(x)
            fmaps.append(x)
            out_ch = min(out_ch * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)
        x = Conv1d(out_ch, kernel_size=self.kernel_sizes[2],
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="conv_mid")(x)
        x = leaky_relu_01(x)
        fmaps.append(x)
        x = Conv1d(1, kernel_size=self.kernel_sizes[3], dtype=self.dtype,
                   param_dtype=self.param_dtype, name="conv_post")(x)
        fmaps.append(x)
        return x, fmaps


def _grouped_conv1d(features, kernel_size, stride, groups, dtype, param_dtype,
                    name):
    return nn.Conv(features, kernel_size=(kernel_size,), strides=(stride,),
                   padding=[((kernel_size - 1) // 2,) * 2],
                   feature_group_count=groups, dtype=dtype,
                   param_dtype=param_dtype, name=name)


class MultiScaleDiscriminator(nn.Module):
    scales: int = 3
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(self.scales):
            outs.append(
                ScaleDiscriminator(dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"scale{i}")(x)
            )
            # AvgPool1d(kernel 4, stride 2, padding 2) between scales
            # (reference hifigan.py:773-775 defaults); flax avg_pool with
            # explicit padding divides by the full window like torch's
            # count_include_pad=True
            x = nn.avg_pool(x, window_shape=(4,), strides=(2,),
                            padding=((2, 2),))
        return outs


class MultiScaleMultiPeriodDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        msd = MultiScaleDiscriminator(dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name="msd")(x)
        mpd = MultiPeriodDiscriminator(dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="mpd")(x)
        return msd + mpd
