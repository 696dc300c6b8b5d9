"""All recipe-layer python scripts must at least parse (guards bit-rot in
code paths the suite doesn't execute, e.g. cluster launchers, client
example)."""

import os
import py_compile

import pytest

EGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "egs", "gtsinger", "ssc1")

SCRIPTS = sorted(
    os.path.join(root, f)
    for root, _, files in os.walk(EGS)
    for f in files if f.endswith(".py")
)


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.relpath(s, EGS) for s in SCRIPTS])
def test_script_compiles(script, tmp_path):
    py_compile.compile(script, cfile=str(tmp_path / "out.pyc"), doraise=True)


def test_scripts_found():
    assert len(SCRIPTS) >= 8  # create_*, cyclic dump, inference, client, utils


def test_f0_fluc_analysis_discriminates_vibrato(tmp_path):
    """The notebook-replacement analysis script (local/f0_fluc_analysis.py,
    reference test_site.ipynb cells 0-3): the spline-residual fluctuation
    it plots — the same compute_f0_fluctuation preprocess-new dumps —
    separates a vibrato rendition from a steady one (higher residual RMS,
    dominant rate at the vibrato frequency)."""
    import importlib.util
    import sys

    import numpy as np

    from serenade_tpu.utils.audio import write_wav

    spec = importlib.util.spec_from_file_location(
        "f0_fluc_analysis",
        os.path.join(EGS, "local", "f0_fluc_analysis.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sr = 24000
    t = np.arange(int(2.0 * sr)) / sr
    vib = 330.0 * 2.0 ** ((50.0 / 1200.0) * np.sin(2 * np.pi * 5.5 * t))
    steady = np.full_like(t, 330.0)
    for name, f0 in (("vib", vib), ("steady", steady)):
        phase = 2 * np.pi * np.cumsum(f0) / sr
        write_wav(str(tmp_path / f"{name}.wav"),
                  (0.4 * np.sin(phase)).astype(np.float32), sr)

    stats = {}
    for name in ("vib", "steady"):
        _, _, _, res, _ = mod.analyze(
            str(tmp_path / f"{name}.wav"), maxf0=440.0, smoothing=10.0,
            f0_backend="viterbi")
        stats[name] = (float(np.sqrt(np.mean(res ** 2))),
                       mod.dominant_rate(res))

    assert stats["vib"][0] > 3.0 * stats["steady"][0], stats
    assert abs(stats["vib"][1] - 5.5) < 1.0, stats

    # the CLI end-to-end (plot written, one line per wav)
    out_png = str(tmp_path / "fluc.png")
    old = sys.argv
    sys.argv = ["prog", out_png, str(tmp_path / "vib.wav"),
                str(tmp_path / "steady.wav"), "--f0-backend", "viterbi"]
    try:
        mod.main()
    finally:
        sys.argv = old
    assert os.path.exists(out_png) and os.path.getsize(out_png) > 0
