"""Serenade: flow-matching singing style conversion by audio infilling.

TPU-native re-design of reference serenade/models/serenade.py:35-221.
Semantics preserved:

* Training = masked segment infilling: a random contiguous segment covering
  10-50% of the batch's max length is the CFM target; conditioning mel is
  zeroed inside it (serenade.py:121-154).  The segment draw lives *inside*
  the jitted step via explicit PRNG keys and iota masks (no Python RNG, no
  dynamic shapes).
* A Gaussian prior loss ties the content encoder output to the mel
  (serenade.py:139-147).
* Inference = style transfer by infilling: the reference clip (with its
  conditioning mel) is packed time-adjacent before the zero-conditioned
  source, the CFM samples the joint sequence, and the source part is
  returned (serenade.py:189-219).  Packing uses static-bucket
  `pack_pair_time`, which removes the reference's batch=1 restriction
  (serenade.py:208-210): samples with different reference lengths batch
  fine here.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from serenade_tpu.config import register
from serenade_tpu.models.cfm import CFM
from serenade_tpu.models.conv1d_resnet import Conv1dResnet
from serenade_tpu.models.gst import StyleEncoder
from serenade_tpu.ops.sequence import pack_pair_time, unpack_suffix_time
from serenade_tpu.utils.masking import length_mask

LOG_2PI = math.log(2.0 * math.pi)


@register("model")
class Serenade(nn.Module):
    input_dim: int = 768            # ContentVec features
    output_dim: int = 80            # log-mel
    encoder_channels: int = 80
    encoder_hidden_dim: int = 512
    decoder_channels: int = 512
    gst_embed_dim: int = 256
    decoder_attention_head_dim: int = 512
    mask_size: Tuple[float, float] = (0.1, 0.5)
    cfg_prob: float = 0.1           # declared-but-unused in the reference too
    dropout: float = 0.05
    fluc_channels: int = 0          # extra F0-fluctuation channels (SerenadeNew)
    remat: bool = False             # rematerialize the UNet (memory for batch)
    gst_norm_type: str = "masked_group"  # "frozen_batch" for torch-ckpt compat
    gst_tokens: int = 50
    gst_conv_chans: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    gst_gru_units: int = 128
    dtype: Any = jnp.bfloat16

    @property
    def conditioning_dim(self) -> int:
        # encoder outs + midi + loudness [+ f0-fluc] + conditioning mel
        return self.encoder_channels + 1 + 1 + self.fluc_channels + self.output_dim

    def setup(self):
        self.encoder = Conv1dResnet(
            out_dim=self.encoder_channels, hidden_dim=self.encoder_hidden_dim,
            num_layers=2,
            dtype=self.dtype,
        )
        self.gst = StyleEncoder(
            idim=self.output_dim,
            gst_tokens=self.gst_tokens,
            gst_token_dim=self.gst_embed_dim,
            conv_chans=tuple(self.gst_conv_chans),
            gru_units=self.gst_gru_units,
            norm_type=self.gst_norm_type,
            dtype=self.dtype,
        )
        self.cfm_decoder = CFM(
            in_channels=self.conditioning_dim + self.output_dim,
            out_channels=self.output_dim,
            spk_embed_dim=self.gst_embed_dim,
            decoder_channels=(self.decoder_channels, self.decoder_channels),
            decoder_attention_head_dim=self.decoder_attention_head_dim,
            dropout=self.dropout,
            remat=self.remat,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def _extra_conditioning(self, rng, T):
        """Hook for variants (SerenadeNew adds F0-fluctuation channels)."""
        return []

    def __call__(self, x, lengths, logmel, midi, loud, *, rng,
                 deterministic: bool = False, extras: Dict[str, Any] | None = None
                 ) -> Dict[str, jnp.ndarray]:
        """Training losses.

        Args:
            x: (B, T, input_dim) content features.
            lengths: (B,) valid lengths.
            logmel: (B, T, output_dim) normalized target mels.
            midi: (B, T, 1) frame MIDI score.
            loud: (B, T, 1) frame loudness.
            rng: PRNG key (segment draw + CFM (t, z) draw).

        Returns:
            dict with ``cfm_loss``, ``prior_loss``, ``loss``.
        """
        b, T, _ = x.shape
        k_seg, k_start, k_cfm = jax.random.split(rng, 3)

        enc_outs = self.encoder(x, lengths)
        spk = self.gst(logmel, lengths)
        mask = length_mask(lengths, T)[..., None]  # (B, T, 1)

        # random contiguous infill segment, scaled by the batch max length
        # (reference uses the padded batch max, serenade.py:121-127)
        maxlen = jnp.max(lengths)
        frac = jax.random.uniform(
            k_seg, (), minval=self.mask_size[0], maxval=self.mask_size[1]
        )
        seg_len = jnp.floor(frac * maxlen).astype(jnp.int32)
        seg_start = jnp.floor(
            jax.random.uniform(k_start, ()) * (maxlen - seg_len + 1)
        ).astype(jnp.int32)
        seg_end = seg_start + seg_len
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        in_seg = ((pos >= seg_start) & (pos < seg_end)).astype(mask.dtype)
        mask_l = mask * in_seg          # loss mask: inside segment
        mask_c = mask * (1.0 - in_seg)  # conditioning mask: outside segment

        # Gaussian prior loss on the content encoder (serenade.py:139-147)
        logmel_f = logmel.astype(jnp.float32)
        enc_f = enc_outs.astype(jnp.float32)
        prior = 0.5 * (jnp.square(logmel_f - enc_f) + LOG_2PI) * mask
        prior_loss = jnp.sum(prior) / (
            jnp.maximum(jnp.sum(mask), 1.0) * self.output_dim
        )

        targets = logmel_f * mask_l
        cond = logmel_f * mask_c
        mu_parts = [enc_outs, midi, loud] + (
            [extras["fluc"]] if extras and "fluc" in extras else []
        )
        mu = jnp.concatenate(
            [p.astype(self.dtype) for p in mu_parts] + [cond.astype(self.dtype)],
            axis=-1,
        )

        cfm_loss, _ = self.cfm_decoder(
            targets, mask, mu, spk, mask_l=mask_l, rng=k_cfm,
            deterministic=deterministic,
        )
        return {
            "cfm_loss": cfm_loss,
            "prior_loss": prior_loss,
            "gauss_mel": enc_outs,
            "loss": cfm_loss + prior_loss,
        }

    # ------------------------------------------------------------------
    # distillation (ReFlow pair generation — beyond the reference, whose
    # only sampler is the fixed 10-step Euler loop, flow_matching.py:40)
    # ------------------------------------------------------------------

    def make_reflow_batch(self, x, lengths, logmel, midi, loud, *, rng,
                          n_timesteps: int = 10, temperature: float = 0.667,
                          solver: str = "euler",
                          mask_size: Tuple[float, float] | None = None,
                          extras: Dict[str, Any] | None = None):
        """Teacher pass for ReFlow distillation: build training-style
        infilling conditioning, then sample the teacher ODE from a KNOWN
        noise draw, returning the (noise, endpoint) pair.

        The conditioning distribution mirrors ``__call__``'s masked-segment
        draw, but ``mask_size`` defaults to ``(mask_size[0], 1.0)`` so the
        segment fraction spans all the way to 1.0 — at fraction 1 the
        conditioning mel is all-zero over the utterance, which is exactly
        the source half of the packed inference layout
        (``inference``'s ``zero_cond``), so distillation covers the
        deployed regime, not just the 10-50% training segments.

        Returns dict with ``mu`` (B,T,cond), ``mask`` (B,T,1) validity,
        ``spk`` (B,spk), ``x0`` (B,T,out) the temperature-scaled noise the
        teacher integrated from, and ``x1_hat`` (B,T,out) the teacher's
        ODE endpoint.  The student's reflow loss supervises the straight
        path x0→x1_hat over the full validity mask (the teacher generated
        every valid frame from this conditioning, so every valid frame
        constrains the distilled map).
        """
        b, T, _ = x.shape
        lo, hi = mask_size if mask_size is not None else (self.mask_size[0], 1.0)
        k_seg, k_start, k_x0 = jax.random.split(rng, 3)

        enc_outs = self.encoder(x, lengths)
        spk = self.gst(logmel, lengths)
        mask = length_mask(lengths, T)[..., None]

        maxlen = jnp.max(lengths)
        frac = jax.random.uniform(k_seg, (), minval=lo, maxval=hi)
        seg_len = jnp.floor(frac * maxlen).astype(jnp.int32)
        seg_start = jnp.floor(
            jax.random.uniform(k_start, ()) * (maxlen - seg_len + 1)
        ).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        in_seg = ((pos >= seg_start) & (pos < seg_start + seg_len)).astype(
            mask.dtype)
        cond = logmel.astype(jnp.float32) * (mask * (1.0 - in_seg))

        mu_parts = [enc_outs, midi, loud] + (
            [extras["fluc"]] if extras and "fluc" in extras else []
        )
        mu = jnp.concatenate(
            [p.astype(self.dtype) for p in mu_parts] + [cond.astype(self.dtype)],
            axis=-1,
        )

        x0 = temperature * jax.random.normal(
            k_x0, (b, T, self.output_dim), jnp.float32)
        x1_hat = self.cfm_decoder.inference(
            mu, mask, spk, n_timesteps=n_timesteps, temperature=temperature,
            rng=None, solver=solver, x0=x0,
        )
        return {"mu": mu, "mask": mask, "spk": spk, "x0": x0,
                "x1_hat": x1_hat}

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def inference(self, x, lengths, midi, loud,
                  ref_x, ref_lengths, ref_logmel, ref_midi, ref_loud, *,
                  rng, n_timesteps: int = 10, temperature: float = 0.667,
                  solver: str = "euler",
                  extras: Dict[str, Any] | None = None):
        """Style conversion (batched; see module docstring).

        Returns (B, Ts, output_dim) f32 mels; frames beyond ``lengths`` are
        padding.
        """
        b, Ts, _ = x.shape
        Tr = ref_x.shape[1]

        enc_src = self.encoder(x, lengths)
        enc_ref = self.encoder(ref_x, ref_lengths)
        spk = self.gst(ref_logmel, ref_lengths)

        zero_cond = jnp.zeros((b, Ts, self.output_dim), self.dtype)
        src_parts = [enc_src, midi, loud] + (
            [extras["fluc"]] if extras and "fluc" in extras else []
        )
        src_mu = jnp.concatenate(
            [p.astype(self.dtype) for p in src_parts] + [zero_cond], axis=-1
        )
        ref_parts = [enc_ref, ref_midi, ref_loud] + (
            [extras["ref_fluc"]] if extras and "ref_fluc" in extras else []
        )
        ref_mu = jnp.concatenate(
            [p.astype(self.dtype) for p in ref_parts]
            + [ref_logmel.astype(self.dtype)],
            axis=-1,
        )

        mu, total_lengths = pack_pair_time(ref_mu, ref_lengths, src_mu, lengths)
        mask = length_mask(total_lengths, Tr + Ts)[..., None]

        mel = self.cfm_decoder.inference(
            mu, mask, spk, n_timesteps=n_timesteps, temperature=temperature,
            rng=rng, solver=solver,
        )
        return unpack_suffix_time(mel, ref_lengths, Ts)
