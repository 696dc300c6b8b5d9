"""SiFiGAN source-filter neural vocoder generator (flax, channels-last).

TPU-native implementation of the architecture the reference instantiates
from the external ``sifigan`` package (bin/sifigan_config/generator/
sifigan.yaml; Yoneyama et al., "Source-Filter HiFi-GAN", ICASSP 2023):

* **Source network**: mel-cepstrum conditioning is upsampled level by level
  (ConvTranspose), a downsampled embedding of the sine excitation signal is
  added at each level, and a *quasi-periodic* residual block — dilated
  convs whose per-timestep dilation follows the pitch (dense dilation
  factors) — shapes the harmonic structure.  A 1×1 conv head emits the
  excitation waveform (used by the training regularization loss).
* **Filter network**: its own upsample stack (share flags supported) whose
  features are summed with the source network's representation at each
  resolution, refined by multi-kernel HiFiGAN residual blocks (averaged),
  then projected to the waveform with tanh.

The pitch-dependent conv is a gather formulation: taps read
``x[t + j * round(d(t) * dilation)]`` — per-frame dynamic dilation with
static shapes, which XLA lowers to vectorized gathers (the CUDA package
does the same indexing on GPU).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.models.layers import Conv1d, ConvTranspose1d
from serenade_tpu.vocoder.layers import HiFiGANResidualBlock, leaky_relu_01


def pitch_dependent_conv(x, d, kernels, bias, dilation: int):
    """Time-varying dilated conv (k=3): taps at t - D(t), t, t + D(t) with
    D(t) = round(d(t) * dilation).

    Args:
        x: (B, T, C).
        d: (B, T) dense dilation factor (level-native samples).
        kernels: (3, C, Cout).
        bias: (Cout,) or None.
    """
    b, t, c = x.shape
    D = jnp.rint(d * dilation).astype(jnp.int32)
    pos = jnp.arange(t)[None, :]
    left = jnp.clip(pos - D, 0, t - 1)
    right = jnp.clip(pos + D, 0, t - 1)

    def gather(xb, idx):
        return jnp.take_along_axis(xb, idx[..., None], axis=0)

    x_l = jax.vmap(gather)(x, left)
    x_r = jax.vmap(gather)(x, right)
    y = (
        jnp.einsum("btc,cd->btd", x_l, kernels[0])
        + jnp.einsum("btc,cd->btd", x, kernels[1])
        + jnp.einsum("btc,cd->btd", x_r, kernels[2])
    )
    if bias is not None:
        y = y + bias
    return y


class QPResidualBlock(nn.Module):
    """Adaptive (pitch-dependent) residual block: per dilation —
    LReLU → PD-conv(dil) [→ LReLU → conv(k3, dil=1)] → +residual."""

    channels: int
    dilations: Tuple[int, ...]
    kernel_size: int = 3
    use_additional_convs: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, d):
        assert self.kernel_size == 3, "QP conv implemented for k=3"
        for i, dil in enumerate(self.dilations):
            h = leaky_relu_01(x)
            kernels = self.param(
                f"pdconv{i}_kernel",
                nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
                (3, self.channels, self.channels), self.param_dtype,
            )
            bias = self.param(f"pdconv{i}_bias", nn.initializers.zeros,
                              (self.channels,), self.param_dtype)
            h = pitch_dependent_conv(
                h.astype(self.dtype), d,
                kernels.astype(self.dtype), bias.astype(self.dtype), dil,
            )
            if self.use_additional_convs:
                h = leaky_relu_01(h)
                h = Conv1d(self.channels, kernel_size=3, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"conv{i}")(h)
            x = x + h
        return x


class SiFiGANGenerator(nn.Module):
    in_channels: int = 43
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (5, 4, 3, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (10, 8, 6, 4)
    source_resblock_kernel_size: int = 3
    source_resblock_dilations: Tuple[Tuple[int, ...], ...] = (
        (1,), (1, 2), (1, 2, 4), (1, 2, 4, 8))
    source_use_additional_convs: bool = True
    filter_resblock_kernel_sizes: Tuple[int, ...] = (3, 5, 7)
    filter_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    filter_use_additional_convs: bool = False
    share_upsamples: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sine, c, dfs):
        """Synthesize a waveform.

        Args:
            sine: (B, T_wav, 1) excitation signal at the waveform rate.
            c: (B, T_frames, in_channels) aux features (mcep + bap).
            dfs: list over levels of (B, T_level) dense dilation factors.

        Returns:
            (B, T_frames * prod(scales), out_channels) waveform, plus the
            source-network excitation output (same length) for training
            regularization.
        """
        n_up = len(self.upsample_scales)
        cum_scales = []
        cum = 1
        for s in self.upsample_scales:
            cum *= s
            cum_scales.append(cum)
        total = cum_scales[-1]

        h = Conv1d(self.channels, kernel_size=self.kernel_size,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="input_conv")(c.astype(self.dtype))

        # upsample stacks; with share_upsamples the SAME module instances
        # serve both networks (flax shares params on reuse)
        sn_ups = [
            ConvTranspose1d(
                self.channels // (2 ** (i + 1)), kernel_size=k_up, stride=s,
                padding=s // 2 + s % 2, output_padding=s % 2,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"sn_up{i}",
            )
            for i, (s, k_up) in enumerate(
                zip(self.upsample_scales, self.upsample_kernel_sizes))
        ]
        if self.share_upsamples:
            fn_ups = sn_ups
        else:
            fn_ups = [
                ConvTranspose1d(
                    self.channels // (2 ** (i + 1)), kernel_size=k_up,
                    stride=s, padding=s // 2 + s % 2, output_padding=s % 2,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"fn_up{i}",
                )
                for i, (s, k_up) in enumerate(
                    zip(self.upsample_scales, self.upsample_kernel_sizes))
            ]

        # ----- source network -----
        e = h
        source_feats = []
        for i, (s, k_up) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            ch = self.channels // (2 ** (i + 1))
            e = leaky_relu_01(e)
            e = sn_ups[i](e)
            # sine embedding: strided conv downsampling the excitation to
            # this level's rate
            stride = total // cum_scales[i]
            k_down = 2 * stride + 1
            emb = Conv1d(ch, kernel_size=k_down, stride=stride,
                         padding=stride, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"sn_sine_down{i}")(sine.astype(self.dtype))
            e = e + emb[:, : e.shape[1], :]
            e = QPResidualBlock(
                channels=ch,
                dilations=tuple(self.source_resblock_dilations[i]),
                kernel_size=self.source_resblock_kernel_size,
                use_additional_convs=self.source_use_additional_convs,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"sn_block{i}",
            )(e, dfs[i][:, : e.shape[1]])
            source_feats.append(e)

        excitation = Conv1d(
            self.out_channels, kernel_size=self.kernel_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="sn_output_conv",
        )(leaky_relu_01(source_feats[-1]))

        # ----- filter network -----
        x = h
        for i, (s, k_up) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            ch = self.channels // (2 ** (i + 1))
            x = leaky_relu_01(x)
            x = fn_ups[i](x)
            x = x + source_feats[i][:, : x.shape[1], :]
            acc = None
            for j, (k_res, dils) in enumerate(
                zip(self.filter_resblock_kernel_sizes,
                    self.filter_resblock_dilations)
            ):
                hh = HiFiGANResidualBlock(
                    kernel_size=k_res, channels=ch, dilations=tuple(dils),
                    use_additional_convs=self.filter_use_additional_convs,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"fn_block{i}_{j}",
                )(x)
                acc = hh if acc is None else acc + hh
            x = acc / len(self.filter_resblock_kernel_sizes)

        x = leaky_relu_01(x)
        x = Conv1d(self.out_channels, kernel_size=self.kernel_size,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="output_conv")(x)
        return jnp.tanh(x), excitation
