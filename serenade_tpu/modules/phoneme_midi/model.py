"""Audio→MIDI transcription network (flax, TPU-native).

Counterpart of reference modules/phoneme_midi/{model,phonerec_model,
subnetworks,feature}.py: a phoneme-recognition branch (ConvStack+BiLSTM →
39 phones) and a pitch branch (DilatedConvStack), fused by a combined
BiLSTM into 3 frame outputs (onset/offset/activation).

TPU notes: the mel frontend is our matmul-DFT mel (the reference uses
nnAudio CUDA kernels, feature.py:9-19); BiLSTMs are bidirectional
``lax.scan``s — the reference's chunked BiLSTM inference
(subnetworks.py:92-128) exists only to bound GPU memory and is numerically
identical to the full pass, so it has no TPU analogue.  BatchNorms run in
inference mode with converted running statistics.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: affine transform with running stats."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        return x * inv + (bias - mean * inv)


class _ConvStack(nn.Module):
    """Shared conv-stack body; first conv optionally time-dilated
    (subnetworks.py:5-77)."""

    output_features: int
    input_features: int
    first_dilation: int = 1  # 2 => DilatedConvStack

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, 1) NHWC
        c = self.output_features // 16
        x = nn.Conv(c, kernel_size=(3, 3),
                    kernel_dilation=(self.first_dilation, 1),
                    padding=[(2, 2) if self.first_dilation == 2 else (1, 1),
                             (1, 1)],
                    name="conv0")(x)
        x = nn.relu(FrozenBatchNorm(c, name="bn0")(x))
        x = nn.Conv(c, kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(c, name="bn1")(x))
        x = nn.max_pool(x, window_shape=(1, 2), strides=(1, 2))
        x = nn.Conv(self.output_features // 8, kernel_size=(3, 3),
                    padding=[(1, 1), (1, 1)], name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(self.output_features // 8, name="bn2")(x))
        x = nn.max_pool(x, window_shape=(1, 2), strides=(1, 2))
        b, t, f, ch = x.shape
        # torch flattens (B, C, T, F) via transpose(1,2) -> (B, T, C, F):
        # match that C-major order for 1:1 fc-weight conversion
        x = x.transpose(0, 1, 3, 2).reshape(b, t, ch * f)
        x = nn.Dense(self.output_features, name="fc")(x)
        return x


class BiLSTM(nn.Module):
    """Bidirectional LSTM with torch-layout fused kernels (gate order
    i,f,g,o) for 1:1 checkpoint conversion."""

    hidden: int

    def _dir_params(self, name, in_dim):
        w_ih = self.param(f"{name}_w_ih", nn.initializers.lecun_normal(),
                          (in_dim, 4 * self.hidden))
        w_hh = self.param(f"{name}_w_hh", nn.initializers.lecun_normal(),
                          (self.hidden, 4 * self.hidden))
        b = self.param(f"{name}_b", nn.initializers.zeros, (4 * self.hidden,))
        return w_ih, w_hh, b

    @nn.compact
    def __call__(self, x):
        b, t, in_dim = x.shape
        h = self.hidden

        def run(x_seq, w_ih, w_hh, bias, reverse):
            def step(carry, xt):
                hprev, cprev = carry
                gates = xt @ w_ih + hprev @ w_hh + bias
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
                hnew = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (hnew, c), hnew

            init = (jnp.zeros((b, h), x_seq.dtype), jnp.zeros((b, h), x_seq.dtype))
            _, ys = jax.lax.scan(step, init, x_seq.transpose(1, 0, 2),
                                 reverse=reverse)
            return ys.transpose(1, 0, 2)

        fw = run(x, *self._dir_params("fw", in_dim), reverse=False)
        bw = run(x, *self._dir_params("bw", in_dim), reverse=True)
        return jnp.concatenate([fw, bw], axis=-1)


class PhonemeRecognitionModel(nn.Module):
    """Mel frames -> 39 phone logits (phonerec_model.py:9-50)."""

    n_mels: int = 229
    model_size: int = 768  # model_complexity * 16
    num_phones: int = 39

    @nn.compact
    def __call__(self, mel_db):
        # mel_db: (B, T, n_mels)
        x = _ConvStack(self.model_size, self.n_mels, name="conv_stack")(
            mel_db[..., None]
        )
        x = BiLSTM(self.model_size // 2, name="rnn")(x)
        return nn.Dense(self.num_phones, name="fc")(x)


class TranscriptionModel(nn.Module):
    """Mel + phone posteriors -> (onset, offset, activation) frame logits
    (model.py:8-78)."""

    n_mels: int = 229
    model_size: int = 768
    num_phones: int = 39

    @nn.compact
    def __call__(self, mel_db):
        lang_logits = PhonemeRecognitionModel(
            n_mels=self.n_mels, model_size=self.model_size,
            num_phones=self.num_phones, name="lang_model",
        )(mel_db)
        # reference feeds num_lbl-1 = 38 features to the lang conv stack
        lang_feat = lang_logits[..., : self.num_phones - 1]

        x_lang = _ConvStack(self.model_size, self.num_phones - 1,
                            name="lang_conv_stack")(lang_feat[..., None])
        x_lang = BiLSTM(self.model_size // 2, name="lang_rnn")(x_lang)

        x_pitch = _ConvStack(self.model_size, self.n_mels, first_dilation=2,
                             name="pitch_conv_stack")(mel_db[..., None])
        x_pitch = BiLSTM(self.model_size // 2, name="pitch_rnn")(x_pitch)

        x = jnp.concatenate([x_pitch, x_lang], axis=-1)
        x = BiLSTM(self.model_size // 2, name="combined_rnn")(x)
        return nn.Dense(3, name="combined_fc")(x)


def mel_db_frontend(audio, sr: int, win_length: int, hop_length: int,
                    n_mels: int, fmin: float, fmax: float):
    """Power-mel in dB with top_db=80 clamp (feature.py:9-25 semantics)."""
    import jax.numpy as jnp

    from serenade_tpu.ops.mel import mel_filterbank
    from serenade_tpu.ops.stft import stft_power

    power = stft_power(jnp.asarray(audio), win_length, hop_length, win_length)
    basis = jnp.asarray(mel_filterbank(sr, win_length, n_mels, fmin, fmax))
    mel = jnp.maximum(power @ basis, 1e-10)
    db = 10.0 * jnp.log10(mel)
    return jnp.maximum(db, jnp.max(db) - 80.0)


def load_transcriber(ckpt_path: str):
    """Load a reference `midi_model.pt` checkpoint and return a
    ``transcribe_fn(audio, fs) -> (pitches, intervals)`` for the
    preprocessing pipeline."""
    import torch

    from serenade_tpu.modules.phoneme_midi.convert import (
        convert_transcription_model,
    )
    from serenade_tpu.modules.phoneme_midi.decoding import FramewiseDecoder
    from serenade_tpu.utils.audio import resample

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    config = ckpt["config"]
    params = convert_transcription_model(ckpt["model_state_dict"], config)
    model = TranscriptionModel(
        n_mels=config["n_mels"],
        model_size=config["model_complexity"] * 16,
    )
    decoder = FramewiseDecoder(config)
    infer = jax.jit(lambda mel: model.apply(params, mel))

    def transcribe_fn(audio, fs):
        sr = config["sample_rate"]
        wav = resample(np.asarray(audio, np.float32), fs, sr)
        mel = mel_db_frontend(
            wav, sr, config["win_length"], config["hop_length"],
            config["n_mels"], config["fmin"], config["fmax"],
        )
        pred = np.asarray(infer(mel[None]))
        pitches, frame_intervals = decoder.decode(pred[0], audio=wav)
        scale = config["hop_length"] / config["sample_rate"]
        intervals = [(s * scale, e * scale) for s, e in frame_intervals]
        notes = [int(round(p)) for p in pitches]
        return notes, intervals

    return transcribe_fn
