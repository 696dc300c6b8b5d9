"""SiFiGAN source-filter neural vocoder generator (flax, channels-last).

TPU-native implementation of the architecture the reference instantiates
from the external ``sifigan`` package (bin/sifigan_config/generator/
sifigan.yaml; Yoneyama et al., "Source-Filter HiFi-GAN", ICASSP 2023).
Topology mirrors the official package so released checkpoints convert 1:1
(see convert.py):

* **Sine embedding**: the excitation sine (waveform rate) is embedded by a
  conv (``sn_emb``) and progressively downsampled by strided convs
  (``sn_down{i}``) to every intermediate resolution.
* **Source network**: the shared ``input_conv`` features are upsampled level
  by level (ConvTranspose ``sn_up{i}``), the matching sine embedding is
  added, and a *quasi-periodic* residual block (``sn_block{i}``) — three
  1×1 convs over {past, current, future} taps whose per-timestep offset
  follows the pitch — shapes the harmonic structure.  ``sn_output_conv``
  emits the excitation waveform (training regularization target).
* **Filter network**: the finest source features are downsampled back
  through ``fn_down{i}`` and injected at every resolution of the filter's
  own upsample stack (``fn_up{i}``), refined by multi-kernel HiFiGAN
  residual blocks (averaged), then projected to the waveform with tanh.

The pitch-dependent taps are a gather formulation: ``x[t ± round(d(t) *
dilation)]`` — per-frame dynamic dilation with static shapes, which XLA
lowers to vectorized gathers (the CUDA package does equivalent indexing).

Reference call site: serenade/bin/ssc_postprocessing.py:92-99,225-237
(``model(in_signal, c, dfs)`` → (waveform, excitation)).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.models.layers import Conv1d, ConvTranspose1d
from serenade_tpu.vocoder.layers import HiFiGANResidualBlock, leaky_relu_01


def pd_gather(x, d, dilation: int):
    """Pitch-dependent past/future taps: ``x[t ∓ round(d(t) * dilation)]``
    with indices clamped to the valid range (boundary samples replicate,
    matching the torch package's clamp convention).

    Args:
        x: (B, T, C).
        d: (B, T) dense dilation factor (level-native samples).

    Returns:
        (x_past, x_future), each (B, T, C).
    """
    b, t, c = x.shape
    D = jnp.rint(d * dilation).astype(jnp.int32)
    pos = jnp.arange(t)[None, :]
    past = jnp.clip(pos - D, 0, t - 1)
    future = jnp.clip(pos + D, 0, t - 1)

    def gather(xb, idx):
        return jnp.take_along_axis(xb, idx[..., None], axis=0)

    return jax.vmap(gather)(x, past), jax.vmap(gather)(x, future)


def pitch_dependent_conv(x, d, kernels, bias, dilation: int):
    """Time-varying dilated conv (k=3): taps at t - D(t), t, t + D(t) with
    D(t) = round(d(t) * dilation).  ``kernels`` is (3, C, Cout) ordered
    (past, current, future); equivalent to the package's three 1×1 convs.
    """
    x_p, x_f = pd_gather(x, d, dilation)
    y = (
        jnp.einsum("btc,cd->btd", x_p, kernels[0])
        + jnp.einsum("btc,cd->btd", x, kernels[1])
        + jnp.einsum("btc,cd->btd", x_f, kernels[2])
    )
    if bias is not None:
        y = y + bias
    return y


class QPResidualBlock(nn.Module):
    """Adaptive (pitch-dependent) residual block.  Per dilation:
    h = LReLU(x); y = convC(h) + convP(h[t-D]) + convF(h[t+D]);
    [y = convA(LReLU(y))]; x = x + y — the package's AdaptiveResidualBlock
    (convsC/convsP/convsF 1×1 + optional convsA k=3)."""

    channels: int
    dilations: Tuple[int, ...]
    kernel_size: int = 3
    use_additional_convs: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, d):
        assert self.kernel_size == 3, "QP conv implemented for k=3"
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i, dil in enumerate(self.dilations):
            h = leaky_relu_01(x)
            h_p, h_f = pd_gather(h, d, dil)
            y = (
                Conv1d(self.channels, kernel_size=1, name=f"convC{i}",
                       **common)(h)
                + Conv1d(self.channels, kernel_size=1, name=f"convP{i}",
                         **common)(h_p)
                + Conv1d(self.channels, kernel_size=1, name=f"convF{i}",
                         **common)(h_f)
            )
            if self.use_additional_convs:
                y = Conv1d(self.channels, kernel_size=3, name=f"convA{i}",
                           **common)(leaky_relu_01(y))
            x = x + y
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
    share_downsamples: bool = False
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
            (waveform, excitation), each (B, T_frames * prod(scales),
            out_channels).  The excitation is the source network's output
            used by the training regularization loss.
        """
        n_up = len(self.upsample_scales)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = Conv1d(self.channels, kernel_size=self.kernel_size,
                   name="input_conv", **common)(c.astype(self.dtype))

        def up(i, tag):
            return ConvTranspose1d(
                self.channels // (2 ** (i + 1)),
                kernel_size=self.upsample_kernel_sizes[i],
                stride=self.upsample_scales[i],
                padding=self.upsample_scales[i] // 2
                + self.upsample_scales[i] % 2,
                output_padding=self.upsample_scales[i] % 2,
                name=f"{tag}_up{i}", **common,
            )

        def down(i, tag):
            # downsamples[i] runs at the (n_up-1-i)-th level's geometry:
            # stride/kernel of the mirrored upsample, channels doubling
            j = n_up - 1 - i
            s = self.upsample_scales[j]
            return Conv1d(
                self.channels // (2 ** j),
                kernel_size=self.upsample_kernel_sizes[j], stride=s,
                padding=s // 2 + s % 2, name=f"{tag}_down{i}", **common,
            )

        sn_ups = [up(i, "sn") for i in range(n_up)]
        fn_ups = sn_ups if self.share_upsamples else [
            up(i, "fn") for i in range(n_up)]
        sn_downs = [down(i, "sn") for i in range(n_up - 1)]
        fn_downs = sn_downs if self.share_downsamples else [
            down(i, "fn") for i in range(n_up - 1)]

        # ----- sine embedding at every resolution -----
        x = Conv1d(self.channels // (2 ** n_up),
                   kernel_size=self.kernel_size, name="sn_emb",
                   **common)(sine.astype(self.dtype))
        embs = [x]
        for i in range(n_up - 1):
            x = leaky_relu_01(sn_downs[i](x))
            embs.append(x)

        # ----- source network -----
        e = h
        for i in range(n_up):
            e = leaky_relu_01(e)
            e = sn_ups[i](e)
            emb = embs[n_up - 1 - i]
            t = min(e.shape[1], emb.shape[1])
            e = e[:, :t, :] + emb[:, :t, :]
            e = QPResidualBlock(
                channels=self.channels // (2 ** (i + 1)),
                dilations=tuple(self.source_resblock_dilations[i]),
                kernel_size=self.source_resblock_kernel_size,
                use_additional_convs=self.source_use_additional_convs,
                name=f"sn_block{i}", **common,
            )(e, dfs[i][:, : e.shape[1]])

        excitation = Conv1d(
            self.out_channels, kernel_size=self.kernel_size,
            name="sn_output_conv", **common,
        )(e)

        # ----- filter network: inject downsampled source features -----
        fembs = [e]
        for i in range(n_up - 1):
            e = leaky_relu_01(fn_downs[i](e))
            fembs.append(e)

        x = h
        for i in range(n_up):
            x = leaky_relu_01(x)
            x = fn_ups[i](x)
            emb = fembs[n_up - 1 - i]
            t = min(x.shape[1], emb.shape[1])
            x = x[:, :t, :] + emb[:, :t, :]
            acc = None
            for j, (k_res, dils) in enumerate(
                zip(self.filter_resblock_kernel_sizes,
                    self.filter_resblock_dilations)
            ):
                hh = HiFiGANResidualBlock(
                    kernel_size=k_res,
                    channels=self.channels // (2 ** (i + 1)),
                    dilations=tuple(dils),
                    use_additional_convs=self.filter_use_additional_convs,
                    name=f"fn_block{i}_{j}", **common,
                )(x)
                acc = hh if acc is None else acc + hh
            x = acc / len(self.filter_resblock_kernel_sizes)

        x = leaky_relu_01(x)
        x = Conv1d(self.out_channels, kernel_size=self.kernel_size,
                   name="fn_output_conv", **common)(x)
        return jnp.tanh(x), excitation


class SiFiGANDirectGenerator(nn.Module):
    """SiFi-GAN *Direct*: the filter network is conditioned on the source
    network's OUTPUT EXCITATION SIGNAL (waveform rate, re-embedded by
    ``fn_emb`` and downsampled to every resolution) instead of its
    intermediate hidden features — the paper's ablation where the filter
    sees the excitation "directly" (Yoneyama et al., ICASSP 2023, §3.3).

    The reference vendors only this variant's hydra config
    (/root/reference/serenade/bin/sifigan_config/generator/
    sifigan.direct.yaml — note it has no ``share_downsamples`` key: the
    filter's downsample stack embeds the excitation, it cannot be shared
    with the sine-embedding downsamples) and never selects it from any
    recipe path; the architecture here is reconstructed from the published
    paper + the config's parameter surface, with module naming parallel to
    :class:`SiFiGANGenerator` so the checkpoint converter maps released
    state dicts the same way.  Golden validation against a released
    checkpoint remains environment-gated (scripts/golden_parity.py).
    """

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
        """Same call contract as :class:`SiFiGANGenerator.__call__`."""
        n_up = len(self.upsample_scales)
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = Conv1d(self.channels, kernel_size=self.kernel_size,
                   name="input_conv", **common)(c.astype(self.dtype))

        def up(i, tag):
            return ConvTranspose1d(
                self.channels // (2 ** (i + 1)),
                kernel_size=self.upsample_kernel_sizes[i],
                stride=self.upsample_scales[i],
                padding=self.upsample_scales[i] // 2
                + self.upsample_scales[i] % 2,
                output_padding=self.upsample_scales[i] % 2,
                name=f"{tag}_up{i}", **common,
            )

        def down(i, tag):
            j = n_up - 1 - i
            s = self.upsample_scales[j]
            return Conv1d(
                self.channels // (2 ** j),
                kernel_size=self.upsample_kernel_sizes[j], stride=s,
                padding=s // 2 + s % 2, name=f"{tag}_down{i}", **common,
            )

        sn_ups = [up(i, "sn") for i in range(n_up)]
        fn_ups = sn_ups if self.share_upsamples else [
            up(i, "fn") for i in range(n_up)]
        sn_downs = [down(i, "sn") for i in range(n_up - 1)]
        fn_downs = [down(i, "fn") for i in range(n_up - 1)]

        # ----- sine embedding at every resolution -----
        x = Conv1d(self.channels // (2 ** n_up),
                   kernel_size=self.kernel_size, name="sn_emb",
                   **common)(sine.astype(self.dtype))
        embs = [x]
        for i in range(n_up - 1):
            x = leaky_relu_01(sn_downs[i](x))
            embs.append(x)

        # ----- source network (identical to SiFiGANGenerator) -----
        e = h
        for i in range(n_up):
            e = leaky_relu_01(e)
            e = sn_ups[i](e)
            emb = embs[n_up - 1 - i]
            t = min(e.shape[1], emb.shape[1])
            e = e[:, :t, :] + emb[:, :t, :]
            e = QPResidualBlock(
                channels=self.channels // (2 ** (i + 1)),
                dilations=tuple(self.source_resblock_dilations[i]),
                kernel_size=self.source_resblock_kernel_size,
                use_additional_convs=self.source_use_additional_convs,
                name=f"sn_block{i}", **common,
            )(e, dfs[i][:, : e.shape[1]])

        excitation = Conv1d(
            self.out_channels, kernel_size=self.kernel_size,
            name="sn_output_conv", **common,
        )(e)

        # ----- filter network: re-embed the excitation SIGNAL and
        # downsample it to every resolution (the "direct" difference) ----
        fe = Conv1d(self.channels // (2 ** n_up),
                    kernel_size=self.kernel_size, name="fn_emb",
                    **common)(excitation)
        fembs = [fe]
        for i in range(n_up - 1):
            fe = leaky_relu_01(fn_downs[i](fe))
            fembs.append(fe)

        x = h
        for i in range(n_up):
            x = leaky_relu_01(x)
            x = fn_ups[i](x)
            emb = fembs[n_up - 1 - i]
            t = min(x.shape[1], emb.shape[1])
            x = x[:, :t, :] + emb[:, :t, :]
            acc = None
            for j, (k_res, dils) in enumerate(
                zip(self.filter_resblock_kernel_sizes,
                    self.filter_resblock_dilations)
            ):
                hh = HiFiGANResidualBlock(
                    kernel_size=k_res,
                    channels=self.channels // (2 ** (i + 1)),
                    dilations=tuple(dils),
                    use_additional_convs=self.filter_use_additional_convs,
                    name=f"fn_block{i}_{j}", **common,
                )(x)
                acc = hh if acc is None else acc + hh
            x = acc / len(self.filter_resblock_kernel_sizes)

        x = leaky_relu_01(x)
        x = Conv1d(self.out_channels, kernel_size=self.kernel_size,
                   name="fn_output_conv", **common)(x)
        return jnp.tanh(x), excitation
