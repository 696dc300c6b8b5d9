"""Vocoder GAN training step (HiFiGAN-style generator vs MSD+MPD).

The reference ships HiFiGAN discriminators but trains its vocoder outside
the repo (SURVEY §2.1: "discriminators unused ... vocoder is pretrained
externally").  This module closes that gap: one jitted step updates the
discriminator (LSGAN real/fake) and the generator (adversarial + feature
matching + multi-resolution mel) with separate optimizers — a standard
alternating GAN step expressed as a single XLA program with donated state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from serenade_tpu.vocoder.losses import (
    discriminator_adversarial_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    multi_resolution_mel_loss,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VocoderTrainState:
    gen_params: Any
    gen_opt: Any
    disc_params: Any
    disc_opt: Any
    step: jnp.ndarray


def create_vocoder_state(gen_params, disc_params, gen_tx, disc_tx):
    return VocoderTrainState(
        gen_params=gen_params,
        gen_opt=gen_tx.init(gen_params),
        disc_params=disc_params,
        disc_opt=disc_tx.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )


def build_vocoder_train_step(
    generator,
    discriminator,
    gen_tx,
    disc_tx,
    *,
    sampling_rate: int = 24000,
    lambda_adv: float = 1.0,
    lambda_fm: float = 2.0,
    lambda_mel: float = 45.0,
    donate: bool = True,
) -> Callable:
    """Return jitted ``(state, batch, rng) -> (state, metrics)``.

    ``batch``: {"mel": (B, T, n_mels), "wav": (B, T*hop, 1)} aligned
    segments.
    """

    def disc_loss_fn(disc_params, gen_params, batch):
        wav_hat = generator.apply(gen_params, batch["mel"])
        wav_hat = jax.lax.stop_gradient(wav_hat)
        outs_real = discriminator.apply(disc_params, batch["wav"])
        outs_fake = discriminator.apply(disc_params, wav_hat)
        return discriminator_adversarial_loss(outs_real, outs_fake)

    def gen_loss_fn(gen_params, disc_params, batch):
        wav_hat = generator.apply(gen_params, batch["mel"])
        outs_fake = discriminator.apply(disc_params, wav_hat)
        outs_real = discriminator.apply(disc_params, batch["wav"])
        adv = generator_adversarial_loss(outs_fake)
        fm = feature_matching_loss(outs_fake, outs_real)
        mel = multi_resolution_mel_loss(
            wav_hat[..., 0], batch["wav"][..., 0], sampling_rate=sampling_rate
        )
        loss = lambda_adv * adv + lambda_fm * fm + lambda_mel * mel
        return loss, {"train/adv_loss": adv, "train/fm_loss": fm,
                      "train/mel_loss": mel}

    def step_fn(state: VocoderTrainState, batch, rng):
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
            state.disc_params, state.gen_params, batch
        )
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        (g_loss, g_metrics), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params, disc_params, batch)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        metrics = dict(g_metrics)
        metrics["train/disc_loss"] = d_loss
        metrics["train/gen_loss"] = g_loss
        new_state = VocoderTrainState(
            gen_params=gen_params, gen_opt=gen_opt,
            disc_params=disc_params, disc_opt=disc_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def sample_mel_wav_segments(dataset_items, rng: "Any", batch_size: int,
                            segment_frames: int, hop_size: int):
    """Random aligned (mel, wav) crops from feature-dump items
    (``logmel`` + ``wave`` h5 keys)."""
    import numpy as np

    mels, wavs = [], []
    for _ in range(batch_size):
        item = dataset_items[rng.integers(len(dataset_items))]
        mel = np.asarray(item["logmel"])
        wav = np.asarray(item["wave"]).reshape(-1)
        max_start = max(mel.shape[0] - segment_frames, 1)
        s = int(rng.integers(max_start))
        mel_seg = mel[s:s + segment_frames]
        wav_seg = wav[s * hop_size:(s + segment_frames) * hop_size]
        if mel_seg.shape[0] < segment_frames:
            mel_seg = np.pad(mel_seg, ((0, segment_frames - mel_seg.shape[0]),
                                       (0, 0)))
        need = segment_frames * hop_size
        if wav_seg.shape[0] < need:
            wav_seg = np.pad(wav_seg, (0, need - wav_seg.shape[0]))
        mels.append(mel_seg)
        wavs.append(wav_seg[:, None])
    return {"mel": np.stack(mels).astype(np.float32),
            "wav": np.stack(wavs).astype(np.float32)}
