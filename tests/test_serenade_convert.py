"""Serenade torch-checkpoint converter parity.

Builds a compact torch twin with the reference's exact module naming
(serenade.py / matcha_components / gst layouts), converts its state dict,
and compares each submodule's output: content encoder, GST style encoder
(BatchNorm running stats + GRU), and the UNet flow estimator."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.models.cfm import CFM
from serenade_tpu.models.conv1d_resnet import Conv1dResnet
from serenade_tpu.models.convert_serenade import convert_serenade
from serenade_tpu.models.gst import StyleEncoder
from serenade_tpu.models.unet import Decoder

IN_DIM, MEL, ENC_CH, DEC_CH, GST_DIM, HEAD_DIM = 16, 8, 8, 32, 16, 16
GST_CHANS = (4, 4, 8, 8, 16, 16)
GRU_UNITS = 8
COND_DIM = ENC_CH + 1 + 1 + MEL          # 18
UNET_IN = COND_DIM + MEL                 # 26


def _build_torch_twin():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    def WN(conv):
        return weight_norm(conv)

    class ResnetBlock(nn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = nn.Sequential(
                nn.LeakyReLU(0.2), nn.ReflectionPad1d(dilation),
                WN(nn.Conv1d(dim, dim, 3, dilation=dilation)),
                nn.LeakyReLU(0.2), WN(nn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = WN(nn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    class Encoder(nn.Module):
        def __init__(self, in_dim, hidden, out_dim, n=2):
            super().__init__()
            layers = [nn.ReflectionPad1d(3),
                      WN(nn.Conv1d(in_dim, hidden, 7))]
            layers += [ResnetBlock(hidden, 2 ** i) for i in range(n)]
            layers += [nn.LeakyReLU(0.2), nn.ReflectionPad1d(3),
                       WN(nn.Conv1d(hidden, out_dim, 7))]
            self.model = nn.Sequential(*layers)

        def forward(self, x):  # (B, T, C)
            return self.model(x.transpose(1, 2)).transpose(1, 2)

    class RefEnc(nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            prev = 1
            for ch in GST_CHANS:
                convs += [nn.Conv2d(prev, ch, 3, 2, 1, bias=False),
                          nn.BatchNorm2d(ch), nn.ReLU()]
                prev = ch
            self.convs = nn.Sequential(*convs)
            freq = MEL
            for _ in GST_CHANS:
                freq = (freq - 3 + 2) // 2 + 1
            self.gru = nn.GRU(freq * GST_CHANS[-1], GRU_UNITS,
                              batch_first=True)

        def forward(self, mel):  # (B, T, MEL)
            x = mel.unsqueeze(1)
            h = self.convs(x).transpose(1, 2)  # (B, T', C, F')
            h = h.contiguous().view(h.size(0), h.size(1), -1)
            _, state = self.gru(h)
            return state[-1]

    class STL(nn.Module):
        def __init__(self, heads=4):
            super().__init__()
            self.heads = heads
            tok_dim = GST_DIM // heads
            self.gst_embs = nn.Parameter(torch.randn(10, tok_dim))

            class MHA(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.linear_q = nn.Linear(GRU_UNITS, GST_DIM)
                    self.linear_k = nn.Linear(tok_dim, GST_DIM)
                    self.linear_v = nn.Linear(tok_dim, GST_DIM)
                    self.linear_out = nn.Linear(GST_DIM, GST_DIM)

                def forward(self, q, k, v):
                    B, H = q.size(0), heads
                    d = GST_DIM // H
                    qh = self.linear_q(q).view(B, -1, H, d).transpose(1, 2)
                    kh = self.linear_k(k).view(B, -1, H, d).transpose(1, 2)
                    vh = self.linear_v(v).view(B, -1, H, d).transpose(1, 2)
                    att = torch.softmax(
                        qh @ kh.transpose(-2, -1) / math.sqrt(d), dim=-1)
                    out = (att @ vh).transpose(1, 2).reshape(B, -1, GST_DIM)
                    return self.linear_out(out)

            self.mha = MHA()

        def forward(self, ref):
            toks = torch.tanh(self.gst_embs)[None].expand(ref.size(0), -1, -1)
            return self.mha(ref.unsqueeze(1), toks, toks).squeeze(1)

    class GST(nn.Module):
        def __init__(self):
            super().__init__()
            self.ref_enc = RefEnc()
            self.stl = STL()

        def forward(self, mel):
            return self.stl(self.ref_enc(mel))

    # ---- UNet twin (matcha decoder layout) ----
    class Block1D(nn.Module):
        def __init__(self, dim, dim_out):
            super().__init__()
            self.block = nn.Sequential(
                nn.Conv1d(dim, dim_out, 3, padding=1),
                nn.GroupNorm(8, dim_out), nn.Mish(),
            )

        def forward(self, x, mask):
            return self.block(x * mask) * mask

    class SpeakerAdapter(nn.Module):
        def __init__(self, spk_dim, dim):
            super().__init__()
            self.W_scale = nn.Linear(spk_dim, dim)
            self.W_bias = nn.Linear(spk_dim, dim)
            nn.init.constant_(self.W_scale.weight, 0.0)
            nn.init.constant_(self.W_scale.bias, 1.0)
            nn.init.constant_(self.W_bias.weight, 0.0)
            nn.init.constant_(self.W_bias.bias, 0.0)

        def forward(self, x, spk):
            y = x.transpose(1, -1)
            mean = y.mean(-1, keepdim=True)
            std = (y.var(-1, keepdim=True, unbiased=False) + 1e-5).sqrt()
            y = (y - mean) / std
            y = y * self.W_scale(spk).unsqueeze(1) + self.W_bias(spk).unsqueeze(1)
            return y.transpose(1, -1)

    class Resnet1D(nn.Module):
        def __init__(self, dim, dim_out, temb, spk_dim):
            super().__init__()
            self.mlp = nn.Sequential(nn.Mish(), nn.Linear(temb, dim_out))
            self.block1 = Block1D(dim, dim_out)
            self.block2 = Block1D(dim_out, dim_out)
            self.res_conv = nn.Conv1d(dim, dim_out, 1)
            self.speaker_projection = SpeakerAdapter(GST_DIM, dim_out)

        def forward(self, x, mask, t, spk):
            h = self.block1(x, mask)
            h = h + self.mlp(t).unsqueeze(-1)
            h = self.block2(h, mask)
            out = h + self.res_conv(x * mask)
            return self.speaker_projection(out, spk)

    class TX(nn.Module):
        def __init__(self, dim, heads=4, head_dim=HEAD_DIM):
            super().__init__()
            inner = heads * head_dim
            self.heads, self.head_dim = heads, head_dim
            self.norm1 = nn.LayerNorm(dim)
            self.attn1 = nn.Module()
            self.attn1.to_q = nn.Linear(dim, inner, bias=False)
            self.attn1.to_k = nn.Linear(dim, inner, bias=False)
            self.attn1.to_v = nn.Linear(dim, inner, bias=False)
            self.attn1.to_out = nn.ModuleList([nn.Linear(inner, dim)])
            self.norm3 = nn.LayerNorm(dim)
            self.ff = nn.Module()
            proj = nn.Linear(dim, dim * 8)
            out = nn.Linear(dim * 4, dim)
            self.ff.net = nn.ModuleList([nn.Module(), nn.Identity(), out])
            self.ff.net[0].proj = proj

        def _attn(self, x):
            B, T, _ = x.shape
            H, d = self.heads, self.head_dim
            q = self.attn1.to_q(x).view(B, T, H, d).transpose(1, 2)
            k = self.attn1.to_k(x).view(B, T, H, d).transpose(1, 2)
            v = self.attn1.to_v(x).view(B, T, H, d).transpose(1, 2)
            att = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(d), -1)
            o = (att @ v).transpose(1, 2).reshape(B, T, H * d)
            return self.attn1.to_out[0](o)

        def forward(self, x):
            x = x + self._attn(self.norm1(x))
            h = self.norm3(x)
            hidden, gate = self.ff.net[0].proj(h).chunk(2, dim=-1)
            h = self.ff.net[2](hidden * F.gelu(gate))
            return x + h

    class UNet(nn.Module):
        def __init__(self):
            super().__init__()
            temb = DEC_CH * 4
            self.time_mlp = nn.Module()
            self.time_mlp.linear_1 = nn.Linear(UNET_IN, temb)
            self.time_mlp.linear_2 = nn.Linear(temb, temb)
            mk_tx = lambda: nn.ModuleList([TX(DEC_CH)])  # noqa: E731
            self.down_blocks = nn.ModuleList([
                nn.ModuleList([Resnet1D(UNET_IN, DEC_CH, temb, GST_DIM),
                               mk_tx(), nn.Conv1d(DEC_CH, DEC_CH, 3, 2, 1)]),
                nn.ModuleList([Resnet1D(DEC_CH, DEC_CH, temb, GST_DIM),
                               mk_tx(), nn.Conv1d(DEC_CH, DEC_CH, 3, padding=1)]),
            ])
            self.mid_blocks = nn.ModuleList([
                nn.ModuleList([Resnet1D(DEC_CH, DEC_CH, temb, GST_DIM),
                               mk_tx()]) for _ in range(2)
            ])
            self.up_blocks = nn.ModuleList([
                nn.ModuleList([Resnet1D(2 * DEC_CH, DEC_CH, temb, GST_DIM),
                               mk_tx(),
                               nn.ConvTranspose1d(DEC_CH, DEC_CH, 4, 2, 1)]),
                nn.ModuleList([Resnet1D(2 * DEC_CH, DEC_CH, temb, GST_DIM),
                               mk_tx(), nn.Conv1d(DEC_CH, DEC_CH, 3, padding=1)]),
            ])
            self.final_block = Block1D(DEC_CH, DEC_CH)
            self.final_proj = nn.Conv1d(DEC_CH, MEL, 1)

        def forward(self, x, mask, mu, t, spk):
            half = UNET_IN // 2
            emb = math.log(10000) / (half - 1)
            emb = torch.exp(torch.arange(half).float() * -emb)
            emb = 1000.0 * t.unsqueeze(1) * emb.unsqueeze(0)
            temb = torch.cat([emb.sin(), emb.cos()], dim=-1)
            temb = self.time_mlp.linear_2(F.silu(self.time_mlp.linear_1(temb)))

            x = torch.cat([x, mu], dim=1)
            hiddens, masks = [], [mask]
            for resnet, txs, down in self.down_blocks:
                m = masks[-1]
                x = resnet(x, m, temb, spk)
                for tx in txs:
                    x = tx(x.transpose(1, 2)).transpose(1, 2)
                hiddens.append(x)
                x = down(x * m)
                masks.append(m[:, :, ::2])
            masks = masks[:-1]
            for resnet, txs in self.mid_blocks:
                x = resnet(x, masks[-1], temb, spk)
                for tx in txs:
                    x = tx(x.transpose(1, 2)).transpose(1, 2)
            for resnet, txs, up in self.up_blocks:
                m = masks.pop()
                x = resnet(torch.cat([x, hiddens.pop()], dim=1), m, temb, spk)
                for tx in txs:
                    x = tx(x.transpose(1, 2)).transpose(1, 2)
                x = up(x * m)
            x = self.final_block(x, mask)
            return self.final_proj(x * mask) * mask

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder(IN_DIM, 24, ENC_CH)
            self.gst = GST()
            self.cfm_decoder = nn.Module()
            self.cfm_decoder.estimator = UNet()

    torch.manual_seed(0)
    twin = Twin().eval()
    # give BatchNorm non-trivial running stats
    with torch.no_grad():
        twin.train()
        for _ in range(3):
            twin.gst(torch.randn(4, 64, MEL))
        twin.eval()
    return twin


def test_converter_full_parity():
    torch = pytest.importorskip("torch")
    twin = _build_torch_twin()
    params = convert_serenade(twin.state_dict())

    B, T = 2, 64
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, IN_DIM)).astype(np.float32)
    mel = rng.normal(size=(B, T, MEL)).astype(np.float32)

    # --- content encoder ---
    with torch.no_grad():
        enc_ref = twin.encoder(torch.from_numpy(x)).numpy()
    enc_mod = Conv1dResnet(out_dim=ENC_CH, hidden_dim=24, num_layers=2)
    enc_got = np.asarray(enc_mod.apply(
        {"params": params["params"]["encoder"]}, jnp.asarray(x)))
    np.testing.assert_allclose(enc_got, enc_ref, atol=2e-4)

    # --- GST (BatchNorm stats + GRU + token attention) ---
    with torch.no_grad():
        gst_ref = twin.gst(torch.from_numpy(mel)).numpy()
    gst_mod = StyleEncoder(idim=MEL, gst_tokens=10, gst_token_dim=GST_DIM,
                           gst_heads=4, conv_chans=GST_CHANS,
                           gru_units=GRU_UNITS, norm_type="frozen_batch")
    gst_got = np.asarray(gst_mod.apply(
        {"params": params["params"]["gst"]}, jnp.asarray(mel)))
    np.testing.assert_allclose(gst_got, gst_ref, atol=2e-4)

    # --- UNet estimator ---
    xt = rng.normal(size=(B, MEL, T)).astype(np.float32)
    mu = rng.normal(size=(B, COND_DIM, T)).astype(np.float32)
    spk = rng.normal(size=(B, GST_DIM)).astype(np.float32)
    tval = np.full((B,), 0.37, np.float32)
    mask = np.ones((B, 1, T), np.float32)
    with torch.no_grad():
        est_ref = twin.cfm_decoder.estimator(
            torch.from_numpy(xt), torch.from_numpy(mask),
            torch.from_numpy(mu), torch.from_numpy(tval),
            torch.from_numpy(spk),
        ).numpy()
    dec = Decoder(in_channels=UNET_IN, out_channels=MEL,
                  channels=(DEC_CH, DEC_CH), attention_head_dim=HEAD_DIM,
                  num_heads=4, dropout=0.0)
    est_got = np.asarray(dec.apply(
        {"params": params["params"]["cfm_decoder"]["estimator"]},
        jnp.asarray(xt.transpose(0, 2, 1)),
        jnp.ones((B, T, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(tval), jnp.asarray(spk), True,
    ))
    np.testing.assert_allclose(est_got, est_ref.transpose(0, 2, 1), atol=5e-4)
