"""Plot utilities smoke test (trainer eval-sample artifacts, reference
utils/plot.py role): files written, non-empty, no display backend needed."""

import os

import numpy as np

from serenade_tpu.utils.plot import plot_f0, plot_mel, plot_mel_pair


def test_plot_outputs_written(tmp_path):
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(120, 80)).astype(np.float32)
    f0 = np.abs(rng.normal(220, 20, 120)).astype(np.float32)
    f0[:10] = 0.0

    p1 = str(tmp_path / "mel.png")
    p2 = str(tmp_path / "pair.png")
    p3 = str(tmp_path / "f0.png")
    plot_mel(p1, mel)
    plot_mel_pair(p2, mel, mel * 0.5)
    plot_f0(p3, [f0, f0 * 1.1], labels=["gt", "pred"])
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 1000
