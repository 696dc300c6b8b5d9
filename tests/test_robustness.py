"""Edge-case robustness: very short audio, single-frame features, empty
batches, and degenerate masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from serenade_tpu.collaters import SSCCollater
from serenade_tpu.features import FeatureConfig, extract_features
from serenade_tpu.ops.f0 import yin_f0, yin_f0_viterbi
from serenade_tpu.ops.mel import logmelfilterbank, loudness_extract
from serenade_tpu.utils.masking import length_mask

SR = 24000


def test_features_on_very_short_audio():
    # 50 ms clip: must produce a consistent (small) number of frames
    wav = (0.1 * np.sin(2 * np.pi * 200 *
                        np.arange(int(0.05 * SR)) / SR)).astype(np.float32)
    fc = FeatureConfig(num_mels=16)
    feats = extract_features("short", wav, SR, fc,
                             content_fn=lambda a: np.zeros(
                                 (max(len(a) // 160, 1), 4), np.float32))
    # may legitimately return None (no note events); either way no crash
    if feats is not None:
        frame_lens = {k: v.shape[0] for k, v in feats.items() if k != "wave"}
        assert len(set(frame_lens.values())) == 1


def test_mel_and_loudness_on_tiny_input():
    wav = jnp.zeros(600)
    mel = logmelfilterbank(wav, SR, fft_size=512, hop_size=240,
                           win_length=480, num_mels=16)
    loud = loudness_extract(wav, SR, 240)
    assert mel.shape[0] == loud.shape[0] == 3
    assert np.isfinite(np.asarray(mel)).all()
    assert np.isfinite(np.asarray(loud)).all()


def test_f0_short_and_all_silence():
    short = jnp.zeros(1200)
    for fn in (yin_f0, yin_f0_viterbi):
        f0, vuv = fn(short, fs=SR)
        assert np.asarray(vuv).sum() == 0
        assert np.isfinite(np.asarray(f0)).all()


def test_collater_empty_after_filter_raises():
    c = SSCCollater(max_frames=10)
    item = {"hubert": np.ones((50, 4), np.float32),
            "logmel": np.ones((50, 2), np.float32),
            "loud": np.ones((50, 1), np.float32),
            "score": np.ones((50, 1), np.float32)}
    with pytest.raises(ValueError):
        c([item])


def test_length_mask_zero_length():
    m = np.asarray(length_mask(jnp.array([0, 3]), 4))
    assert m[0].sum() == 0 and m[1].sum() == 3


def test_model_with_min_length_batch():
    from serenade_tpu.models import Serenade

    model = Serenade(input_dim=8, output_dim=8, encoder_channels=8,
                     decoder_channels=16, gst_embed_dim=16,
                     decoder_attention_head_dim=16, dtype=jnp.float32)
    b, t = 1, 64
    ks = jax.random.split(jax.random.key(0), 6)
    # a batch whose valid length is tiny relative to the bucket
    args = (jax.random.normal(ks[0], (b, t, 8)), jnp.array([5]),
            jax.random.normal(ks[1], (b, t, 8)),
            jax.random.normal(ks[2], (b, t, 1)),
            jax.random.normal(ks[3], (b, t, 1)))

    @jax.jit
    def run(*a):
        params = model.init({"params": ks[4]}, *a, rng=ks[5],
                            deterministic=True)
        return model.apply(params, *a, rng=ks[5], deterministic=True)["loss"]

    assert np.isfinite(float(run(*args)))
