"""Griffin-Lim vocoder backend: mel round-trip fidelity + Vocoder facade."""

import numpy as np
import jax.numpy as jnp
import yaml

from serenade_tpu.ops.mel import logmelfilterbank

SR, FFT, HOP, WIN, MELS = 24000, 512, 240, 480, 80


def _harmonic(f0=220.0, seconds=1.2):
    t = np.arange(int(seconds * SR)) / SR
    y = sum((0.5 ** k) * np.sin(2 * np.pi * (k + 1) * f0 * t)
            for k in range(6))
    return (0.4 * y / np.max(np.abs(y))).astype(np.float32)


def _mel(audio):
    return np.asarray(logmelfilterbank(
        jnp.asarray(audio), SR, fft_size=FFT, hop_size=HOP, win_length=WIN,
        num_mels=MELS, fmin=63, fmax=12000, eps=1e-6))


def test_mel_roundtrip_correlation():
    from serenade_tpu.vocoder.griffin_lim import GriffinLimSynth

    audio = _harmonic()
    mel = _mel(audio)
    synth = GriffinLimSynth(SR, FFT, HOP, WIN, MELS, 63, 12000, n_iter=24)
    y = np.asarray(synth.apply({}, jnp.asarray(mel[None])))[0, :, 0]
    assert y.shape[0] == mel.shape[0] * HOP
    assert np.isfinite(y).all() and np.max(np.abs(y)) <= 1.0

    mel2 = _mel(y[: len(audio)])
    n = min(mel.shape[0], mel2.shape[0])
    corr = np.corrcoef(mel[:n].ravel(), mel2[:n].ravel())[0, 1]
    # deterministic inversion recovers the spectral envelope: the metric
    # chain (mel -> wav -> WORLD mcep) stays meaningful for MCD trends
    assert corr > 0.95, corr


def test_vocoder_available_gate(tmp_path):
    """CLIs construct a vocoder iff the checkpoint exists OR the config
    declares a checkpoint-free generator (GriffinLim)."""
    from serenade_tpu.vocoder.vocoder import vocoder_available

    gl_yml = tmp_path / "gl.yml"
    with open(gl_yml, "w") as f:
        yaml.safe_dump(dict(generator_type="GriffinLim"), f)
    hifi_yml = tmp_path / "hifi.yml"
    with open(hifi_yml, "w") as f:
        yaml.safe_dump(dict(generator_params=dict(channels=32)), f)

    assert vocoder_available(dict(checkpoint="none", config=str(gl_yml)))
    assert vocoder_available(dict(config=str(gl_yml)))
    assert not vocoder_available(dict(checkpoint="/no/such.pkl",
                                      config=str(hifi_yml)))
    assert not vocoder_available(dict(checkpoint="/no/such.pkl",
                                      config=str(tmp_path / "missing.yml")))
    assert not vocoder_available({})
    assert not vocoder_available(None)
    ckpt = tmp_path / "real.pkl"
    ckpt.write_bytes(b"x")
    assert vocoder_available(dict(checkpoint=str(ckpt)))


def test_vocoder_facade_griffin_lim(tmp_path):
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.vocoder import Vocoder

    cfg = dict(sampling_rate=SR, generator_type="GriffinLim",
               generator_params=dict(fft_size=FFT, hop_size=HOP,
                                     win_length=WIN, num_mels=MELS,
                                     fmin=63, fmax=12000, n_iter=8))
    cfg_path = tmp_path / "gl.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    stats = str(tmp_path / "stats.h5")
    write_hdf5(stats, "mean", np.zeros(MELS, np.float32))
    write_hdf5(stats, "scale", np.ones(MELS, np.float32))

    voc = Vocoder("none", str(cfg_path), stats,
                  trg_stats={"mean": np.zeros(MELS, np.float32),
                             "scale": np.ones(MELS, np.float32)})
    mel = _mel(_harmonic(seconds=0.5))
    y, sr = voc.decode(mel)
    assert sr == SR and y.shape[0] == mel.shape[0] * HOP
    assert np.isfinite(y).all()

    yb = voc.decode_batch(np.stack([mel, mel]))
    assert yb.shape == (2, mel.shape[0] * HOP)
    np.testing.assert_allclose(yb[0], yb[1])


def test_vocoder_facade_missing_stats_fails_loudly(tmp_path):
    """A missing stats file must raise, not bake NaN stats.

    np.asarray(None, float32) is NaN; before the round-5 fix a bad
    vocoder.stats path (e.g. a conf hardcoding another run's dumpdir)
    produced silently-NaN eval/decode audio.
    """
    import pytest

    from serenade_tpu.vocoder.vocoder import Vocoder

    cfg = dict(sampling_rate=SR, generator_type="GriffinLim",
               generator_params=dict(fft_size=FFT, hop_size=HOP,
                                     win_length=WIN, num_mels=MELS,
                                     fmin=63, fmax=12000, n_iter=8))
    cfg_path = tmp_path / "gl.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    with pytest.raises(FileNotFoundError, match="vocoder stats"):
        Vocoder("none", str(cfg_path), str(tmp_path / "nope.h5"),
                trg_stats={"mean": np.zeros(MELS, np.float32),
                           "scale": np.ones(MELS, np.float32)})
