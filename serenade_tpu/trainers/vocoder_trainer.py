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
    lambda_reg: float = 0.0,
    donate: bool = True,
    gen_forward: Callable | None = None,
    reg_loss_fn: Callable | None = None,
) -> Callable:
    """Return jitted ``(state, batch, rng) -> (state, metrics)``.

    ``batch``: {"mel": (B, T, n_mels), "wav": (B, T*hop, 1)} aligned
    segments for the default (HiFiGAN) forward; pass ``gen_forward``
    (e.g. :func:`sifigan_forward`) for generators with other conditioning.

    ``reg_loss_fn(aux, batch) -> scalar`` adds a ``lambda_reg``-weighted
    auxiliary term (SiFiGAN source regularization,
    :func:`serenade_tpu.vocoder.losses.residual_loss`); when set,
    ``gen_forward`` must return ``(waveform, aux)``.
    """

    if gen_forward is None:
        def gen_forward(gen_params, batch):
            return generator.apply(gen_params, batch["mel"])

    def run_gen(gen_params, batch):
        out = gen_forward(gen_params, batch)
        return out if isinstance(out, tuple) else (out, None)

    def disc_loss_fn(disc_params, gen_params, batch):
        wav_hat, _ = run_gen(gen_params, batch)
        wav_hat = jax.lax.stop_gradient(wav_hat)
        outs_real = discriminator.apply(disc_params, batch["wav"])
        outs_fake = discriminator.apply(disc_params, wav_hat)
        return discriminator_adversarial_loss(outs_real, outs_fake)

    def gen_loss_fn(gen_params, disc_params, batch):
        wav_hat, aux = run_gen(gen_params, batch)
        outs_fake = discriminator.apply(disc_params, wav_hat)
        outs_real = discriminator.apply(disc_params, batch["wav"])
        adv = generator_adversarial_loss(outs_fake)
        fm = feature_matching_loss(outs_fake, outs_real)
        mel = multi_resolution_mel_loss(
            wav_hat[..., 0], batch["wav"][..., 0], sampling_rate=sampling_rate
        )
        loss = lambda_adv * adv + lambda_fm * fm + lambda_mel * mel
        metrics = {"train/adv_loss": adv, "train/fm_loss": fm,
                   "train/mel_loss": mel}
        if reg_loss_fn is not None:
            if aux is None:
                raise ValueError("reg_loss_fn requires a gen_forward that "
                                 "returns (waveform, aux)")
            reg = reg_loss_fn(aux, batch)
            loss = loss + lambda_reg * reg
            metrics["train/reg_loss"] = reg
        return loss, metrics

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
        # +1: the window starting at exactly L - S is a valid crop — an
        # exclusive bound never trains on the last S frames' tail
        max_start = max(mel.shape[0] - segment_frames + 1, 1)
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


# ---------------------------------------------------------------------------
# SiFiGAN (source-filter vocoder) training support
# ---------------------------------------------------------------------------

def sifigan_forward(generator, with_excitation: bool = False):
    """``gen_forward`` for :class:`serenade_tpu.sifigan.SiFiGANGenerator`:
    the batch carries the sine excitation, aux features, and per-level
    dense dilation factors (the stage-9 conditioning contract,
    bin/ssc_postprocessing.py:200-245).

    ``with_excitation=True`` returns ``(waveform, source excitation)`` so
    the train step can apply the SiFiGAN source-regularization loss
    (:func:`serenade_tpu.vocoder.losses.residual_loss`) to the excitation.
    """

    def fwd(gen_params, batch):
        wav_hat, excitation = generator.apply(
            gen_params, batch["sine"], batch["c"], list(batch["dfs"])
        )
        return (wav_hat, excitation) if with_excitation else wav_hat

    return fwd


def prepare_sifigan_utterance(
    wav,
    fs: int,
    *,
    frame_period_ms: float = 5.0,
    mcep_dim: int = 39,
    dense_factors=(0.5, 1, 4, 8),
    upsample_scales=(5, 4, 3, 2),
    f0_floor: float = 70.0,
    f0_ceil: float = 800.0,
    signal_types=("sine",),
):
    """WORLD-style analysis of one training utterance into SiFiGAN streams.

    Returns ``{"c": (T, D), "sine": (T*hop, S), "dfs": [(T*cum_i,)...],
    "wav": (T*hop,)}`` or None when no voiced frames exist.  Matches the
    postprocessing CLI's conditioning construction so a trained generator
    is drop-in for stage 9.
    """
    import jax.numpy as jnp
    import numpy as np

    from serenade_tpu.bin.ssc_postprocessing import convert_continuous_f0
    from serenade_tpu.ops.f0 import smooth_f0_median, yin_f0
    from serenade_tpu.sifigan import SignalGenerator
    from serenade_tpu.sifigan.features import (
        dense_factors_per_level, world_mcep_bap,
    )

    wav = np.asarray(wav, np.float32).reshape(-1)
    hop = int(fs * frame_period_ms / 1000.0)
    f0, _ = yin_f0(jnp.asarray(wav), fs=fs, f0_floor=f0_floor,
                   f0_ceil=f0_ceil, frame_period_ms=frame_period_ms)
    f0 = np.asarray(smooth_f0_median(f0))
    uv, cf0, ok = convert_continuous_f0(f0)
    if not ok:
        return None
    mcep, bap, _ = world_mcep_bap(wav, f0, fs, frame_period_ms, mcep_dim)
    c = np.concatenate([mcep, bap], axis=1).astype(np.float32)

    n = min(c.shape[0], len(wav) // hop)
    c = c[:n]
    cf0 = cf0[:n]
    sine = SignalGenerator(fs, hop, signal_types=signal_types)(cf0)
    dfs = dense_factors_per_level(cf0, fs, dense_factors, upsample_scales)
    return {
        "c": c,
        "sine": sine[: n * hop],
        "dfs": [d[: n * int(cum)] for d, cum in
                zip(dfs, np.cumprod(upsample_scales))],
        "wav": wav[: n * hop],
        # continuous F0 on the frame grid: the residual (source
        # regularization) loss tracks the envelope along it
        "cf0": np.asarray(cf0[:n], np.float32),
    }


def sample_sifigan_segments(items, rng, batch_size: int,
                            segment_frames: int, hop_size: int,
                            upsample_scales=(5, 4, 3, 2)):
    """Random aligned (c, sine, dfs, wav) crops from prepared utterances
    (:func:`prepare_sifigan_utterance` outputs)."""
    import numpy as np

    cum = np.cumprod(upsample_scales)
    cs, sines, wavs, cf0s = [], [], [], []
    dfs_lv = [[] for _ in cum]
    for _ in range(batch_size):
        it = items[rng.integers(len(items))]
        n = it["c"].shape[0]
        s = int(rng.integers(max(n - segment_frames + 1, 1)))
        e = s + segment_frames
        cs.append(it["c"][s:e])
        sines.append(it["sine"][s * hop_size:e * hop_size])
        wavs.append(it["wav"][s * hop_size:e * hop_size, None])
        cf0s.append(it["cf0"][s:e])
        for i, cm in enumerate(cum):
            dfs_lv[i].append(it["dfs"][i][s * int(cm):e * int(cm)])
    return {
        "c": np.stack(cs).astype(np.float32),
        "sine": np.stack(sines).astype(np.float32),
        "wav": np.stack(wavs).astype(np.float32),
        "cf0": np.stack(cf0s).astype(np.float32),
        "dfs": tuple(np.stack(d).astype(np.float32) for d in dfs_lv),
    }
