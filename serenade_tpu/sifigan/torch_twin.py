"""Torch twin of the official ``sifigan`` package generator (CPU-only).

Reconstructs the public SiFiGAN generator (Yoneyama et al., ICASSP 2023;
architecture pinned by the reference's hydra config,
/root/reference/serenade/bin/sifigan_config/generator/sifigan.yaml) with the
official module naming — ``input_conv``, ``sn``/``fn`` ModuleDicts holding
``upsamples``/``downsamples``/``blocks``/``emb``/``output_conv`` ModuleLists,
weight-normed convs — so that

* state dicts saved from this twin have the same key layout as released
  SiFiGAN checkpoints (``{"model": {"generator": ...}}``), and
* ``convert.load_sifigan_checkpoint`` can be parity-tested end to end
  without network access to the real release.

Used only in tests and offline conversion; torch never touches the TPU
path.  Sequential indices of activations inside upsample/downsample blocks
are parameter-free, and the converter matches conv keys at any Sequential
position, so minor ordering differences vs the released package cannot
break conversion.
"""

from __future__ import annotations

import torch
import torch.nn as nn


def _act():
    return nn.LeakyReLU(negative_slope=0.1)


class AdaptiveResidualBlock(nn.Module):
    """Pitch-dependent residual block (official naming: convsC/P/F/A)."""

    def __init__(self, kernel_size, channels, dilations, bias=True,
                 use_additional_convs=True):
        super().__init__()
        assert kernel_size == 3
        self.dilations = list(dilations)
        self.use_additional_convs = use_additional_convs
        self.convsC = nn.ModuleList()
        self.convsP = nn.ModuleList()
        self.convsF = nn.ModuleList()
        if use_additional_convs:
            self.convsA = nn.ModuleList()
        for _ in self.dilations:
            self.convsC += [nn.Conv1d(channels, channels, 1, bias=bias)]
            self.convsP += [nn.Conv1d(channels, channels, 1, bias=bias)]
            self.convsF += [nn.Conv1d(channels, channels, 1, bias=bias)]
            if use_additional_convs:
                self.convsA += [nn.Sequential(
                    _act(),
                    nn.Conv1d(channels, channels, kernel_size, bias=bias,
                              padding=(kernel_size - 1) // 2),
                )]

    def forward(self, x, d):
        # d: (B, 1, T) dense dilation factor
        b, c, t = x.shape
        pos = torch.arange(t)
        for i, dilation in enumerate(self.dilations):
            h = torch.nn.functional.leaky_relu(x, 0.1)
            D = torch.round(d[:, 0, :] * dilation).long()
            past = (pos[None, :] - D).clamp(0, t - 1)
            future = (pos[None, :] + D).clamp(0, t - 1)
            hp = torch.gather(h, 2, past[:, None, :].expand(b, c, t))
            hf = torch.gather(h, 2, future[:, None, :].expand(b, c, t))
            y = self.convsC[i](h) + self.convsP[i](hp) + self.convsF[i](hf)
            if self.use_additional_convs:
                y = self.convsA[i](y)
            x = x + y
        return x


class ResidualBlock(nn.Module):
    """HiFiGAN-style residual block (official naming: convs1/convs2)."""

    def __init__(self, kernel_size, channels, dilations, bias=True,
                 use_additional_convs=False):
        super().__init__()
        self.use_additional_convs = use_additional_convs
        self.convs1 = nn.ModuleList()
        if use_additional_convs:
            self.convs2 = nn.ModuleList()
        for dilation in dilations:
            self.convs1 += [nn.Sequential(
                _act(),
                nn.Conv1d(channels, channels, kernel_size, bias=bias,
                          dilation=dilation,
                          padding=(kernel_size - 1) // 2 * dilation),
            )]
            if use_additional_convs:
                self.convs2 += [nn.Sequential(
                    _act(),
                    nn.Conv1d(channels, channels, kernel_size, bias=bias,
                              padding=(kernel_size - 1) // 2),
                )]

    def forward(self, x):
        for i in range(len(self.convs1)):
            h = self.convs1[i](x)
            if self.use_additional_convs:
                h = self.convs2[i](h)
            x = x + h
        return x


class SiFiGANGeneratorTorch(nn.Module):
    def __init__(
        self,
        in_channels=43,
        out_channels=1,
        channels=512,
        kernel_size=7,
        upsample_scales=(5, 4, 3, 2),
        upsample_kernel_sizes=(10, 8, 6, 4),
        source_network_params=None,
        filter_network_params=None,
        share_upsamples=False,
        share_downsamples=False,
        bias=True,
        use_weight_norm=True,
    ):
        super().__init__()
        source_network_params = source_network_params or {
            "resblock_kernel_size": 3,
            "resblock_dilations": [(1,), (1, 2), (1, 2, 4), (1, 2, 4, 8)],
            "use_additional_convs": True,
        }
        filter_network_params = filter_network_params or {
            "resblock_kernel_sizes": (3, 5, 7),
            "resblock_dilations": [(1, 3, 5)] * 3,
            "use_additional_convs": False,
        }
        self.num_upsamples = len(upsample_scales)
        self.num_blocks = len(filter_network_params["resblock_kernel_sizes"])
        self.share_upsamples = share_upsamples
        self.share_downsamples = share_downsamples
        n_up = self.num_upsamples

        self.input_conv = nn.Conv1d(in_channels, channels, kernel_size,
                                    bias=bias,
                                    padding=(kernel_size - 1) // 2)
        self.sn = nn.ModuleDict()
        self.fn = nn.ModuleDict()
        self.sn["upsamples"] = nn.ModuleList()
        self.fn["upsamples"] = nn.ModuleList()
        self.sn["blocks"] = nn.ModuleList()
        self.fn["blocks"] = nn.ModuleList()
        for i in range(n_up):
            def mk_up(i=i):
                return nn.Sequential(
                    _act(),
                    nn.ConvTranspose1d(
                        channels // (2 ** i), channels // (2 ** (i + 1)),
                        upsample_kernel_sizes[i], upsample_scales[i],
                        padding=upsample_scales[i] // 2
                        + upsample_scales[i] % 2,
                        output_padding=upsample_scales[i] % 2, bias=bias,
                    ),
                )
            self.sn["upsamples"] += [mk_up()]
            if not share_upsamples:
                self.fn["upsamples"] += [mk_up()]
            self.sn["blocks"] += [AdaptiveResidualBlock(
                kernel_size=source_network_params["resblock_kernel_size"],
                channels=channels // (2 ** (i + 1)),
                dilations=source_network_params["resblock_dilations"][i],
                bias=bias,
                use_additional_convs=source_network_params[
                    "use_additional_convs"],
            )]
            for j in range(self.num_blocks):
                self.fn["blocks"] += [ResidualBlock(
                    kernel_size=filter_network_params[
                        "resblock_kernel_sizes"][j],
                    channels=channels // (2 ** (i + 1)),
                    dilations=filter_network_params["resblock_dilations"][j],
                    bias=bias,
                    use_additional_convs=filter_network_params[
                        "use_additional_convs"],
                )]

        self.sn["emb"] = nn.Conv1d(1, channels // (2 ** n_up), kernel_size,
                                   bias=bias,
                                   padding=(kernel_size - 1) // 2)
        self.sn["downsamples"] = nn.ModuleList()
        if not share_downsamples:
            self.fn["downsamples"] = nn.ModuleList()
        for i in range(n_up - 1):
            j = n_up - 1 - i
            s = upsample_scales[j]

            def mk_down(j=j, s=s):
                return nn.Sequential(
                    nn.Conv1d(
                        channels // (2 ** (j + 1)), channels // (2 ** j),
                        upsample_kernel_sizes[j], s,
                        padding=s // 2 + s % 2, bias=bias,
                    ),
                    _act(),
                )
            self.sn["downsamples"] += [mk_down()]
            if not share_downsamples:
                self.fn["downsamples"] += [mk_down()]

        self.sn["output_conv"] = nn.Conv1d(
            channels // (2 ** n_up), out_channels, kernel_size, bias=bias,
            padding=(kernel_size - 1) // 2)
        self.fn["output_conv"] = nn.Sequential(
            _act(),
            nn.Conv1d(channels // (2 ** n_up), out_channels, kernel_size,
                      bias=bias, padding=(kernel_size - 1) // 2),
            nn.Tanh(),
        )

        if use_weight_norm:
            self.apply_weight_norm()

    def apply_weight_norm(self):
        def _apply(m):
            if isinstance(m, (nn.Conv1d, nn.ConvTranspose1d)):
                nn.utils.weight_norm(m)
        self.apply(_apply)

    def remove_weight_norm(self):
        def _remove(m):
            try:
                nn.utils.remove_weight_norm(m)
            except ValueError:
                pass
        self.apply(_remove)

    def forward(self, x, c, d):
        """x: sine (B, 1, T_wav); c: (B, in_channels, T_frames);
        d: list of (B, 1, T_level).  Returns (waveform, excitation)."""
        c = self.input_conv(c)
        e = c

        x = self.sn["emb"](x)
        embs = [x]
        for i in range(self.num_upsamples - 1):
            x = self.sn["downsamples"][i](x)
            embs += [x]
        for i in range(self.num_upsamples):
            e = self.sn["upsamples"][i](e)
            emb = embs[self.num_upsamples - 1 - i]
            t = min(e.size(2), emb.size(2))
            e = e[:, :, :t] + emb[:, :, :t]
            e = self.sn["blocks"][i](e, d[i][:, :, :e.size(2)])
        e_out = self.sn["output_conv"](e)

        fembs = [e]
        for i in range(self.num_upsamples - 1):
            if self.share_downsamples:
                e = self.sn["downsamples"][i](e)
            else:
                e = self.fn["downsamples"][i](e)
            fembs += [e]
        for i in range(self.num_upsamples):
            if self.share_upsamples:
                c = self.sn["upsamples"][i](c)
            else:
                c = self.fn["upsamples"][i](c)
            emb = fembs[self.num_upsamples - 1 - i]
            t = min(c.size(2), emb.size(2))
            c = c[:, :, :t] + emb[:, :, :t]
            cs = 0.0
            for j in range(self.num_blocks):
                cs = cs + self.fn["blocks"][i * self.num_blocks + j](c)
            c = cs / self.num_blocks
        c = self.fn["output_conv"](c)
        return c, e_out


class SiFiGANDirectGeneratorTorch(SiFiGANGeneratorTorch):
    """SiFi-GAN *Direct* twin: the filter network embeds the source
    network's OUTPUT EXCITATION (``fn.emb``, waveform rate) and
    downsamples that, instead of taking the source hidden features —
    matching sifigan_config/generator/sifigan.direct.yaml's parameter
    surface (no ``share_downsamples``)."""

    def __init__(self, *args, out_channels=1, channels=512, kernel_size=7,
                 upsample_scales=(5, 4, 3, 2), use_weight_norm=True,
                 **kwargs):
        # parent builds without weight norm so fn.emb can be added first
        super().__init__(*args, out_channels=out_channels,
                         channels=channels, kernel_size=kernel_size,
                         upsample_scales=upsample_scales,
                         share_downsamples=False,
                         use_weight_norm=False, **kwargs)
        self.fn["emb"] = nn.Conv1d(
            out_channels, channels // (2 ** len(upsample_scales)),
            kernel_size, bias=kwargs.get("bias", True),
            padding=(kernel_size - 1) // 2)
        if use_weight_norm:
            self.apply_weight_norm()

    def forward(self, x, c, d):
        c = self.input_conv(c)
        e = c

        x = self.sn["emb"](x)
        embs = [x]
        for i in range(self.num_upsamples - 1):
            x = self.sn["downsamples"][i](x)
            embs += [x]
        for i in range(self.num_upsamples):
            e = self.sn["upsamples"][i](e)
            emb = embs[self.num_upsamples - 1 - i]
            t = min(e.size(2), emb.size(2))
            e = e[:, :, :t] + emb[:, :, :t]
            e = self.sn["blocks"][i](e, d[i][:, :, :e.size(2)])
        e_out = self.sn["output_conv"](e)

        fe = self.fn["emb"](e_out)
        fembs = [fe]
        for i in range(self.num_upsamples - 1):
            fe = self.fn["downsamples"][i](fe)
            fembs += [fe]
        for i in range(self.num_upsamples):
            if self.share_upsamples:
                c = self.sn["upsamples"][i](c)
            else:
                c = self.fn["upsamples"][i](c)
            emb = fembs[self.num_upsamples - 1 - i]
            t = min(c.size(2), emb.size(2))
            c = c[:, :, :t] + emb[:, :, :t]
            cs = 0.0
            for j in range(self.num_blocks):
                cs = cs + self.fn["blocks"][i * self.num_blocks + j](c)
            c = cs / self.num_blocks
        c = self.fn["output_conv"](c)
        return c, e_out
