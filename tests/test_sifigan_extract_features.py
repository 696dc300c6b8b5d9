"""serenade-sifigan-extract-features: the dump contract and its
consumption by the trainer's segment sampler (reference surface:
bin/sifigan_config/extract_features.yaml — WORLD analysis of a wav.scp
into hdf5 feature files for vocoder training).

The CLI is the single analysis run here; cross-process exact parity
with an in-process twin is deliberately NOT asserted (a voiced/unvoiced
flip on one boundary frame between XLA flag-sets moves that frame's
mcep by whole units — the alignment/shape contract is what consumers
rely on, and the analysis itself is already pinned by
tests/test_sifigan_trainer.py in-process)."""

import os
import subprocess
import sys

import numpy as np

from serenade_tpu.bin.sifigan_extract_features import load_precomputed
from serenade_tpu.utils.audio import write_wav

SR = 24000
UP = (5, 4, 3, 2)
HOP = 120  # 5 ms at 24 kHz — the official sifigan regime
MCEP_DIM = 10


def _singing_wav(dur=1.0, f0=220.0):
    t = np.arange(int(SR * dur)) / SR
    f0t = f0 * (1 + 0.02 * np.sin(2 * np.pi * 5.0 * t))
    ph = 2 * np.pi * np.cumsum(f0t) / SR
    return sum((0.4 / h) * np.sin(h * ph) for h in range(1, 5)).astype(
        np.float32)


def test_extract_cli_dump_contract(tmp_path):
    wav_path = tmp_path / "utt1.wav"
    write_wav(str(wav_path), _singing_wav(), SR)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"utt1 {wav_path}\n")
    dumpdir = tmp_path / "sifigan_feats"

    r = subprocess.run(
        [sys.executable, "-m", "serenade_tpu.bin.sifigan_extract_features",
         "--wav-scp", str(scp), "--dumpdir", str(dumpdir),
         "--mcep-dim", str(MCEP_DIM)],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             # share the test session's persistent compile cache so the
             # WORLD-analysis program compiles once across processes
             "JAX_COMPILATION_CACHE_DIR": "/tmp/serenade_tpu_jax_cache"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert (dumpdir / "utt1.h5").exists()

    items = load_precomputed(str(dumpdir))
    assert len(items) == 1
    got = items[0]

    # the trainer's stream-alignment contract (prepare_sifigan_utterance
    # postconditions): frame-grid c/cf0, hop-aligned sine/wav, per-level
    # dense dilation factors at the cumulative upsample rates
    n = got["c"].shape[0]
    assert n > 0
    assert got["c"].shape[1] == MCEP_DIM + 1 + 3  # mcep(order+1)+3 bap
    assert got["cf0"].shape == (n,)
    assert got["sine"].shape[0] == n * HOP
    assert got["wav"].shape[0] == n * HOP
    cum = np.cumprod(UP)
    assert len(got["dfs"]) == len(UP)
    for d, cm in zip(got["dfs"], cum):
        assert d.shape[0] == n * cm
        assert np.all(d >= 1.0)
    for k in ("c", "cf0", "sine", "wav"):
        assert np.isfinite(got[k]).all(), k
    # voiced singing: continuous F0 near the synthesized 220 Hz, sine
    # excitation actually oscillating
    voiced = got["cf0"][got["cf0"] > 0]
    assert voiced.size > n // 2
    assert 150 < np.median(voiced) < 330
    assert np.abs(got["sine"]).max() > 0.01

    # the loaded items drive the trainer's segment sampler directly
    from serenade_tpu.trainers.vocoder_trainer import (
        sample_sifigan_segments,
    )

    rng = np.random.default_rng(0)
    batch = sample_sifigan_segments(items, rng, 2, 8, HOP,
                                    upsample_scales=UP)
    assert batch["c"].shape == (2, 8, MCEP_DIM + 1 + 3)
    assert batch["wav"].shape == (2, 8 * HOP, 1)
    assert np.isfinite(batch["sine"]).all()
