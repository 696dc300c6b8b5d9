"""Harvest-class F0 estimator accuracy contract.

Mirrors the role of the reference's pyworld.harvest call
(serenade/bin/preprocess.py:485-493): f0 + vuv at 10 ms frames.  Ground
truth is analytic (synthesized harmonic signals with known instantaneous
f0), the same methodology as tests/test_f0_world_quantified.py; agreement
with the default YIN-Viterbi backend is cross-checked so either estimator
can serve the preprocessing CLI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from serenade_tpu.ops.f0 import yin_f0_viterbi
from serenade_tpu.ops.harvest import harvest_f0

FS = 24000
DUR = 1.0
N = int(FS * DUR)
HOP = 240
N_FRAMES = 1 + N // HOP
FLOOR, CEIL = 80.0, 800.0

_rng = np.random.default_rng(7)


def _harmonic(f0_traj, n_harm=6, amps=None, noise=0.0):
    phase = 2 * np.pi * np.cumsum(f0_traj) / FS
    amps = amps or [0.6 / h for h in range(1, n_harm + 1)]
    x = sum(a * np.sin((h + 1) * phase) for h, a in enumerate(amps))
    if noise:
        x = x + _rng.normal(0.0, noise, N)
    return x.astype(np.float32)


def _frame_truth(f0_traj):
    idx = np.minimum(np.arange(N_FRAMES) * HOP, N - 1)
    return f0_traj[idx]


def _cents(f0, ref):
    return 1200.0 * np.abs(np.log2(np.maximum(f0, 1e-6) / np.maximum(ref, 1e-6)))


t = np.arange(N) / FS

# one batch, one compilation: every case shares length and search range
VIBRATO = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
GLIDE = 196.0 * 2 ** (t / DUR)                      # one octave up
HIGH = 523.25 * (1 + 0.02 * np.sin(2 * np.pi * 6.0 * t))   # soprano C5
FLAT = np.full(N, 330.0)

PURE = np.full(N, 261.63)

_cases = {
    "vibrato": _harmonic(VIBRATO),
    "glide": _harmonic(GLIDE),
    "high": _harmonic(HIGH, n_harm=4),
    "breathy": _harmonic(FLAT, amps=[0.25, 0.35, 0.2, 0.1], noise=0.03),
    # pure sine: regression for the harmonic-leakage flat bias (the h>=2
    # DFT probes see only fundamental main-lobe leakage; ungated it pulled
    # the refinement ~15 cents flat)
    "pure": _harmonic(PURE, n_harm=1, amps=[0.5]),
    "silence": np.zeros(N, np.float32),
    "noise": _rng.normal(0.0, 0.1, N).astype(np.float32),
}
_truth = {
    "vibrato": VIBRATO, "glide": GLIDE, "high": HIGH, "breathy": FLAT,
    "pure": PURE, "silence": np.zeros(N), "noise": np.zeros(N),
}
_names = list(_cases)


@pytest.fixture(scope="module")
def harvest_out():
    batch = jnp.stack([jnp.asarray(_cases[n]) for n in _names])
    f0, vuv = jax.vmap(
        lambda a: harvest_f0(a, fs=FS, f0_floor=FLOOR, f0_ceil=CEIL)
    )(batch)
    return {n: (np.asarray(f0[i]), np.asarray(vuv[i]))
            for i, n in enumerate(_names)}


# interior frames (window edges excluded)
CORE = slice(12, N_FRAMES - 12)


@pytest.mark.parametrize("name,mean_bound,max_bound", [
    ("vibrato", 3.0, 10.0),
    ("glide", 6.0, 25.0),
    ("high", 3.0, 10.0),
    ("breathy", 6.0, 30.0),
    ("pure", 2.0, 5.0),
])
def test_voiced_accuracy(harvest_out, name, mean_bound, max_bound):
    f0, vuv = harvest_out[name]
    ref = _frame_truth(_truth[name])
    m = vuv[CORE] > 0
    # voiced recall on fully-voiced signals
    assert m.mean() >= 0.9, f"{name}: voiced recall {m.mean():.2f}"
    err = _cents(f0[CORE][m], ref[CORE][m])
    assert err.mean() < mean_bound, f"{name}: mean {err.mean():.2f} cents"
    assert err.max() < max_bound, f"{name}: max {err.max():.2f} cents"


def test_silence_and_noise_unvoiced(harvest_out):
    for name in ("silence", "noise"):
        f0, vuv = harvest_out[name]
        assert vuv.mean() <= 0.05, f"{name}: {vuv.mean():.2f} voiced"
        assert np.all(f0[vuv == 0] == 0.0)


def test_no_octave_errors_on_glide(harvest_out):
    """The glide sweeps through every channel boundary; candidate handoff
    between channels must not produce octave jumps."""
    f0, vuv = harvest_out["glide"]
    ref = _frame_truth(GLIDE)
    m = vuv[CORE] > 0
    ratio = f0[CORE][m] / ref[CORE][m]
    assert np.all((ratio > 0.75) & (ratio < 1.5)), (
        f"octave error: ratios {ratio.min():.2f}..{ratio.max():.2f}"
    )


def test_agreement_with_yin_viterbi(harvest_out):
    """Either backend may serve preprocessing; on clean singing-like input
    they must agree (both in voicing and in Hz)."""
    f0_h, vuv_h = harvest_out["vibrato"]
    f0_y, vuv_y = (np.asarray(a) for a in yin_f0_viterbi(
        jnp.asarray(_cases["vibrato"]), fs=FS, f0_floor=FLOOR, f0_ceil=CEIL,
    ))
    both = (vuv_h[CORE] > 0) & (vuv_y[CORE] > 0)
    agree = both.mean()
    assert agree >= 0.85, f"voicing agreement {agree:.2f}"
    # harvest is sub-cent vs analytic truth on this case (see
    # test_voiced_accuracy); the inter-estimator gap is YIN's vibrato
    # tracking error (~6-9 cents), so the bound guards against octave-level
    # disagreement, not fine accuracy
    diff = _cents(f0_h[CORE][both], f0_y[CORE][both])
    assert np.median(diff) < 20.0, f"median inter-estimator {np.median(diff):.2f} cents"
    assert diff.max() < 100.0, f"max inter-estimator {diff.max():.2f} cents"


def test_padded_tail_stays_unvoiced(harvest_out):
    """The bucketed group path zero-pads waveforms; padding must not
    produce voiced frames (features.py group extraction contract)."""
    half = np.concatenate([_cases["vibrato"][: N // 2], np.zeros(N // 2, np.float32)])
    f0, vuv = (np.asarray(a) for a in harvest_f0(
        jnp.asarray(half), fs=FS, f0_floor=FLOOR, f0_ceil=CEIL,
    ))
    tail = vuv[N_FRAMES * 55 // 100:]
    assert tail.mean() <= 0.05, f"padded tail voiced {tail.mean():.2f}"


def test_output_contract(harvest_out):
    """Same (f0, vuv) contract as the reference harvest usage: frame count
    1 + len//hop, f0==0 exactly where vuv==0."""
    for name in _names:
        f0, vuv = harvest_out[name]
        assert f0.shape == (N_FRAMES,) and vuv.shape == (N_FRAMES,)
        assert np.all((f0 > 0) == (vuv > 0))
        assert np.all((f0 == 0) | ((f0 >= FLOOR) & (f0 <= CEIL)))


@pytest.mark.slow
def test_harvest_backend_through_feature_group_path():
    """The preprocess CLI's group path with --f0-backend harvest: fused
    mel+loudness program plus the harvest F0 in one vmapped dispatch."""
    from serenade_tpu.features import FeatureConfig, extract_signal_features_group

    cfg = FeatureConfig.from_dict(dict(
        sampling_rate=FS, fft_size=512, hop_size=240, win_length=480,
        num_mels=80, fmin=0, fmax=12000, shiftms=10,
    ))
    n = 128 * 240  # one length bucket
    t_ax = np.arange(n) / FS
    ph = 2 * np.pi * np.cumsum(261.6 * (1 + 0.02 * np.sin(
        2 * np.pi * 5 * t_ax))) / FS
    wavs = [sum((0.4 / h) * np.sin(h * ph) for h in range(1, 5)).astype(
        np.float32),
        np.zeros(n, np.float32)]
    out = extract_signal_features_group(wavs, cfg, 80.0, 800.0, "harvest")
    voiced = out[0]["f0"][out[0]["f0"] > 0]
    assert voiced.size > 80
    assert abs(np.median(voiced) - 261.6) < 5.0
    assert out[0]["logmel"].shape[1] == 80
    # silent group member stays unvoiced
    assert (out[1]["f0"] > 0).mean() < 0.05


def test_interval_f0_precision_position_independent():
    """Event positions are (int cell, fraction) pairs, so sub-sample
    precision does not degrade with absolute position: a pure tone's
    interval-F0 estimate at the END of a multi-minute signal is as exact
    as at the start (absolute float32 coordinates lose ~0.06-0.25 samples
    of ULP past 1-2M samples)."""
    import jax.numpy as jnp

    from serenade_tpu.ops.harvest import _interval_f0

    fs_d = 4000.0
    f0 = 123.4
    n = 3_000_000  # ~12.5 minutes at the decimated rate
    t = np.arange(n, dtype=np.float64)
    sig = jnp.asarray(np.sin(2 * np.pi * f0 * t / fs_d), jnp.float32)
    frames = jnp.asarray([100, n // 2, n - 100], jnp.int32)
    est = np.asarray(_interval_f0(sig, n, frames, fs_d))
    err_cents = 1200.0 * np.abs(np.log2(est / f0))
    # start and end must BOTH be sub-cent; with absolute float32
    # positions the last frame drifts by several cents
    assert err_cents.max() < 1.0, (est, err_cents)
    assert abs(err_cents[2] - err_cents[0]) < 0.5
