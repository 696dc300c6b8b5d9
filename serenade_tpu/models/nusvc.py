"""NUSVC: legacy NU SVCC T13 voice-conversion model (provenance parity).

Counterpart of reference models/t13_nusvcc.py:28-154 — the pre-Serenade
voice-conversion model the SSC system evolved from.  Kept functional here
(unlike the reference copy, which imports a missing espnet2 GST and is
effectively dead code — SURVEY §2.1): encoder 771→384, 1×1 post-encoder
conv →80, CFM(160→80) conditioned on a GST style vector.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from serenade_tpu.config import register
from serenade_tpu.models.cfm import CFM
from serenade_tpu.models.conv1d_resnet import Conv1dResnet
from serenade_tpu.models.gst import StyleEncoder
from serenade_tpu.models.layers import Conv1d
from serenade_tpu.utils.masking import length_mask


@register("model")
class NUSVC(nn.Module):
    input_dim: int = 771   # cvec + lf0 + vuv + loudness
    output_dim: int = 80
    encoder_channels: int = 384
    decoder_channels: int = 256
    gst_embed_dim: int = 256
    decoder_attention_head_dim: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.encoder = Conv1dResnet(
            out_dim=self.encoder_channels, hidden_dim=512, num_layers=2,
            dtype=self.dtype,
        )
        self.post_encoder = Conv1d(self.output_dim, kernel_size=1, padding=0,
                                   dtype=self.dtype)
        self.gst = StyleEncoder(
            idim=self.output_dim, gst_tokens=50,
            gst_token_dim=self.gst_embed_dim,
            conv_chans=(128, 128, 256, 256, 512, 512), dtype=self.dtype,
        )
        self.cfm_decoder = CFM(
            in_channels=self.output_dim * 2,
            out_channels=self.output_dim,
            spk_embed_dim=self.gst_embed_dim,
            decoder_channels=(self.decoder_channels, self.decoder_channels),
            decoder_attention_head_dim=self.decoder_attention_head_dim,
            dtype=self.dtype,
        )

    def __call__(self, x, lengths, logmel, *, rng, deterministic: bool = False):
        b, T, _ = x.shape
        enc = self.post_encoder(self.encoder(x, lengths))
        spk = self.gst(logmel, lengths)
        mask = length_mask(lengths, T)[..., None]
        prior_loss = jnp.sum(
            0.5 * jnp.square(logmel.astype(jnp.float32)
                             - enc.astype(jnp.float32)) * mask
        ) / (jnp.maximum(jnp.sum(mask), 1.0) * self.output_dim)
        cfm_loss, _ = self.cfm_decoder(
            logmel.astype(jnp.float32), mask, enc, spk, rng=rng,
            deterministic=deterministic,
        )
        return {"cfm_loss": cfm_loss, "prior_loss": prior_loss,
                "loss": cfm_loss + prior_loss}

    def inference(self, x, lengths, ref_logmel, ref_lengths, *, rng,
                  n_timesteps: int = 10, temperature: float = 0.667,
                  solver: str = "euler"):
        b, T, _ = x.shape
        enc = self.post_encoder(self.encoder(x, lengths))
        spk = self.gst(ref_logmel, ref_lengths)
        mask = length_mask(lengths, T)[..., None]
        return self.cfm_decoder.inference(
            enc, mask, spk, n_timesteps=n_timesteps, temperature=temperature,
            rng=rng, solver=solver,
        )
