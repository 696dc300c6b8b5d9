"""Quantified F0/WORLD accuracy on realistic singing-like signals.

The reference preprocesses with pyworld Harvest/CheapTrick/D4C
(serenade/bin/preprocess.py:485-493, utils/signal.py:108-130); this repo
replaces them with yin_f0_viterbi / cheaptrick / band_aperiodicity redesigns.
pyworld is not installable here, so instead of estimator-vs-estimator
agreement these tests measure error against *analytically known* ground
truth on synthesized singing: harmonic stacks with vibrato, glides, jitter,
amplitude modulation, breath noise, and hard voiced/unvoiced boundaries.
The asserted bounds are the documented accuracy contract (PARITY.md):

* voiced-frame F0 error ≤ 10 cents median, ≤ 20 cents p95 under real
  60-cent 5.5 Hz vibrato (measured: 2.8-7.7 median / 7.1-15.3 p95 across
  150/220/440 Hz bases — the vibrato sweeps ~1200 cents/s, so several
  cents come from frame centering, not estimator bias);
* voiced/unvoiced agreement ≥ 97 % (measured: 98.7-99.5 %);
* CheapTrick envelope within 2.5 dB RMS of the true filter log-envelope
  over 100 Hz–8 kHz on a stationary vowel (measured: 1.64 dB);
* sp2mc→mc2sp round trip ≤ 0.05 dB RMS at order 39, the stage-9 setting
  (measured: 0.006 dB);
* band aperiodicity within 1 dB of the true band noise-to-total ratio for
  a ∈ [0.1, 0.3] and within 1.5 dB at a = 0.01 for F0 ≥ 150 Hz (measured:
  ≤ 0.5 dB except the 80 Hz a=0.01 corner, where the estimate stays
  conservative at ≤ -20 dB).
"""

import numpy as np
import pytest

from serenade_tpu.ops.f0 import yin_f0_viterbi
from serenade_tpu.ops.sptk import ALPHA, mc2sp, sp2mc
from serenade_tpu.ops.world import cheaptrick

SR = 24000
HOP_MS = 5.0  # stage-9 frame period (reference sifigan config)


def _singing_voice(duration=2.0, base=220.0, vibrato_hz=5.5,
                   vibrato_cents=60.0, glide_semitones=4.0, jitter=0.003,
                   breath=0.01, seed=0):
    """Synthetic singing: glide + vibrato F0 track driving a 10-harmonic
    sawtooth-ish stack with per-period jitter, shimmer, and breath noise.
    Returns (wav, f0_track at HOP_MS, vuv_track)."""
    rng = np.random.default_rng(seed)
    n = int(duration * SR)
    t = np.arange(n) / SR

    # F0 contour: slow glide up + vibrato (both in log domain, like real
    # singing), with a silent gap in the middle (consonant/breath)
    glide = glide_semitones * (t / duration)
    vib = (vibrato_cents / 100.0) * np.sin(2 * np.pi * vibrato_hz * t)
    f0 = base * 2.0 ** (glide / 12.0) * 2.0 ** (vib / 12.0)
    # per-sample jitter (random walk in log-f0, ~0.3%)
    walk = np.cumsum(rng.normal(0, jitter / np.sqrt(SR / 100), n))
    walk -= np.linspace(0, walk[-1], n)
    f0 = f0 * np.exp(walk)

    voiced = np.ones(n, bool)
    gap = slice(int(0.9 * SR), int(1.05 * SR))
    voiced[gap] = False
    lead = slice(0, int(0.05 * SR))
    tail = slice(n - int(0.05 * SR), n)
    voiced[lead] = False
    voiced[tail] = False

    phase = 2 * np.pi * np.cumsum(np.where(voiced, f0, 0.0)) / SR
    wav = np.zeros(n)
    for h in range(1, 11):
        wav += (1.0 / h) * np.sin(h * phase)
    # shimmer: slow amplitude modulation
    wav *= 1.0 + 0.1 * np.sin(2 * np.pi * 3.1 * t)
    wav *= voiced.astype(float)
    # fade the gap edges to avoid clicks (5 ms ramps)
    ramp = int(0.005 * SR)
    for edge in (gap.start, gap.stop, lead.stop, tail.start):
        lo, hi = max(edge - ramp, 0), min(edge + ramp, n)
        wav[lo:hi] *= np.linspace(1, 0, hi - lo) if wav[lo] != 0 else \
            np.linspace(0, 1, hi - lo)
    wav += breath * rng.normal(size=n)
    wav = (0.6 * wav / np.abs(wav).max()).astype(np.float32)

    hop = int(SR * HOP_MS / 1000)
    idx = np.arange(0, n, hop)
    return wav, f0[idx], voiced[idx]


@pytest.mark.parametrize("base,seed", [(220.0, 0), (440.0, 1), (150.0, 2)])
def test_f0_accuracy_cents_and_vuv(base, seed):
    wav, f0_true, vuv_true = _singing_voice(base=base, seed=seed)
    f0_est, vuv_est = yin_f0_viterbi(
        wav, SR, f0_floor=max(base / 2.5, 60.0), f0_ceil=base * 3.2,
        frame_period_ms=HOP_MS,
    )
    f0_est = np.asarray(f0_est)
    vuv_est = np.asarray(vuv_est).astype(bool)
    m = min(len(f0_est), len(f0_true))
    f0_est, vuv_est = f0_est[:m], vuv_est[:m]
    f0_true, vuv_true = f0_true[:m], vuv_true[:m]

    # VUV agreement, excluding ±2 frames around transitions (both pyworld
    # and any framewise estimator are ambiguous there)
    trans = np.convolve(np.abs(np.diff(vuv_true.astype(int))),
                        np.ones(5), mode="same") > 0
    stable = ~np.append(trans, False)
    agree = (vuv_est == vuv_true)[stable].mean()
    assert agree >= 0.97, f"VUV agreement {agree:.3f} < 0.97"

    both = vuv_true & vuv_est & stable
    assert both.sum() > 50
    cents = 1200 * np.abs(np.log2(f0_est[both] / f0_true[both]))
    med, p95 = np.median(cents), np.percentile(cents, 95)
    assert med <= 10.0, f"median F0 error {med:.1f} cents > 10"
    assert p95 <= 20.0, f"p95 F0 error {p95:.1f} cents > 20"


def test_cheaptrick_envelope_distortion():
    """Stationary vowel through a known 3-formant filter: the CheapTrick
    envelope must track the true log envelope within 2.5 dB RMS over
    100 Hz-8 kHz."""
    rng = np.random.default_rng(3)
    f0_val = 220.0
    n = int(1.0 * SR)
    t = np.arange(n) / SR
    phase = 2 * np.pi * f0_val * t
    src = np.zeros(n)
    for h in range(1, 50):
        if h * f0_val < SR / 2:
            src += np.sin(h * phase + rng.uniform(0, 2 * np.pi))

    # known all-pole-ish envelope: 3 gaussian formants in log domain
    fft_size = 2048
    freqs = np.fft.rfftfreq(fft_size, 1 / SR)
    log_env = np.zeros_like(freqs)
    for fc, bw, amp in ((700, 130, 4.0), (1200, 170, 3.0), (2600, 250, 2.0)):
        log_env += amp * np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
    log_env -= 0.0015 * freqs / 100  # gentle spectral tilt

    # filter by overlap-add with the (zero-phase) envelope response
    h_resp = np.fft.irfft(np.exp(log_env))
    h_resp = np.roll(h_resp, fft_size // 2)[fft_size // 2 - 256:
                                            fft_size // 2 + 256]
    h_resp *= np.hanning(len(h_resp))
    wav = np.convolve(src, h_resp, mode="same")
    wav = (0.5 * wav / np.abs(wav).max()).astype(np.float32)

    hop = int(SR * HOP_MS / 1000)
    n_frames = len(wav) // hop
    f0 = np.full(n_frames, f0_val, np.float32)
    sp = np.asarray(cheaptrick(wav, f0, SR, frame_period_ms=HOP_MS))
    assert sp.shape[0] == n_frames

    # compare log envelopes (shape, not absolute gain) on inner frames
    sp_freqs = np.fft.rfftfreq(2 * (sp.shape[1] - 1), 1 / SR)
    band = (sp_freqs >= 100) & (sp_freqs <= 8000)
    true_band = np.interp(sp_freqs[band], freqs, log_env)
    errs = []
    for i in range(n_frames // 4, 3 * n_frames // 4):
        est = 0.5 * np.log(np.maximum(sp[i][band], 1e-20))  # power→amplitude
        est = est - est.mean()
        ref = true_band - true_band.mean()
        errs.append(np.sqrt(np.mean((est - ref) ** 2)))
    rms_db = 20 / np.log(10) * float(np.median(errs))
    assert rms_db <= 2.5, f"envelope distortion {rms_db:.2f} dB > 2.5"


def test_mcep_roundtrip_distortion():
    """sp2mc→mc2sp at order 39 (the stage-9 mcep setting,
    reference ssc_postprocessing.py:169-171) reconstructs a realistic
    envelope within 0.05 dB RMS."""
    rng = np.random.default_rng(4)
    fftlen = 1024
    freqs = np.fft.rfftfreq(fftlen, 1 / SR)
    log_env = np.zeros_like(freqs)
    for fc, bw, amp in ((500, 120, 3.5), (1500, 200, 2.5), (2500, 280, 2.0),
                        (3500, 350, 1.0)):
        log_env += amp * np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
    log_env -= 0.002 * freqs / 100
    sp = np.exp(2 * log_env)[None, :]  # power spectrum, one frame

    alpha = ALPHA[SR]
    mc = sp2mc(sp, order=39, alpha=alpha)
    sp_rec = mc2sp(mc, alpha=alpha, fftlen=fftlen)

    band = (freqs >= 100) & (freqs <= 10000)
    err_db = 10 * (np.log10(sp_rec[0][band]) - np.log10(sp[0][band]))
    rms = float(np.sqrt(np.mean(err_db ** 2)))
    assert rms <= 0.05, f"mcep round-trip {rms:.3f} dB > 0.05"


@pytest.mark.parametrize("f0_val", [80.0, 150.0, 300.0])
def test_band_aperiodicity_known_noise_ratio(f0_val):
    """Harmonic stack + white noise with a KNOWN per-band noise-to-total
    power ratio `a`: band_aperiodicity must recover 10*log10(a).  This is
    the quantified accuracy contract for the D4C-class estimator
    (reference serenade/bin/ssc_postprocessing.py:167-168 uses pyworld
    D4C, unavailable here)."""
    from serenade_tpu.ops.world import band_aperiodicity

    rng = np.random.default_rng(int(f0_val))
    t = np.arange(SR * 2) / SR
    harm = np.zeros_like(t)
    for h in range(1, int(12000 / f0_val)):
        harm += np.sin(2 * np.pi * f0_val * h * t + rng.uniform(0, 2 * np.pi))
    harm /= np.sqrt(np.mean(harm ** 2))
    noise = rng.normal(size=t.shape)
    noise /= np.sqrt(np.mean(noise ** 2))

    n_frames = int(len(t) / (SR * HOP_MS / 1000))
    f0_track = np.full(n_frames, f0_val, np.float32)

    for a in (0.01, 0.1, 0.3):
        x = (np.sqrt(1 - a) * harm + np.sqrt(a) * noise).astype(np.float32)
        bap = np.asarray(band_aperiodicity(x, f0_track, SR,
                                           frame_period_ms=HOP_MS))
        assert bap.shape == (n_frames, 3)
        est = bap[20:-20].mean(axis=0)  # steady-state frames
        true_db = 10 * np.log10(a)
        if a >= 0.1:
            assert np.all(np.abs(est - true_db) <= 1.0), (
                f"f0={f0_val} a={a}: est {est} vs {true_db:.1f} dB")
        elif f0_val >= 150.0:
            assert np.all(np.abs(est - true_db) <= 1.5), (
                f"f0={f0_val} a={a}: est {est} vs {true_db:.1f} dB")
        else:
            # 80 Hz, a=0.01: at the accuracy limit; must stay strongly
            # periodic (conservative in the less-noisy direction)
            assert np.all(est <= -15.0), f"f0={f0_val} a={a}: est {est}"


def _voice_like(f0_val, a, rng):
    """Harmonic stack with 1/h amplitudes (voice-like spectral decay —
    D4C's LoveTrain gate requires energy concentrated below 4 kHz) mixed
    with white noise at overall noise power fraction `a`.  Returns the
    signal and the TRUE per-band noise/total power ratios in dB."""
    t = np.arange(SR * 2) / SR
    harm = np.zeros_like(t)
    for h in range(1, int(11900 / f0_val)):
        harm += (1.0 / h) * np.sin(
            2 * np.pi * f0_val * h * t + rng.uniform(0, 2 * np.pi))
    harm /= np.sqrt(np.mean(harm ** 2))
    noise = rng.normal(size=t.shape)
    noise /= np.sqrt(np.mean(noise ** 2))
    x = (np.sqrt(1 - a) * harm + np.sqrt(a) * noise).astype(np.float32)

    H = np.fft.rfft(harm)
    N = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(len(t), 1 / SR)
    true_db = []
    for b in range(3):
        m = (freqs >= b * 3000) & (freqs < (b + 1) * 3000)
        pn = a * np.sum(np.abs(N[m]) ** 2)
        ph = (1 - a) * np.sum(np.abs(H[m]) ** 2)
        true_db.append(10 * np.log10(pn / (pn + ph)))
    return x, np.asarray(true_db)


@pytest.mark.parametrize("f0_val", [80.0, 150.0, 300.0])
def test_d4c_static_group_delay_measure(f0_val):
    """WORLD D4C (ops/world.d4c — the reference's pyworld.d4c algorithm,
    ssc_postprocessing.py:167-168) on voice-like harmonic+noise signals:

    * the LoveTrain gate passes voiced frames and zeroes unvoiced ones;
    * coarse aperiodicity is MONOTONE in the true noise fraction per band;
    * the upper bands track the true ratio within 4 dB at a<=0.1 — while
      the sorted-spectrum ratio saturates at high a in the low band (the
      measured D4C behavior; that compression is WHY band_aperiodicity
      stays the default bap extractor, see ops/world.py docstring).
    """
    from serenade_tpu.ops.world import d4c

    rng = np.random.default_rng(int(f0_val) + 7)
    n_frames = int(SR * 2 / (SR * HOP_MS / 1000))
    f0_track = np.full(n_frames, f0_val, np.float32)

    prev = None
    for a in (0.01, 0.1, 0.3):
        x, true_db = _voice_like(f0_val, a, rng)
        bap = np.asarray(d4c(x, f0_track, fs=SR, frame_period_ms=HOP_MS))
        assert bap.shape == (n_frames, 3)
        assert np.all(bap <= 0.0)
        est = bap[20:-20].mean(axis=0)
        # voiced frames pass the gate (not all-zero = fully aperiodic);
        # at a=0.3 the LoveTrain gate may legitimately declare low-pitch
        # heavily-noisy frames aperiodic, so only require it at a<=0.1
        if a <= 0.1:
            assert est[0] < -0.5, (a, est)
        # monotone in the noise fraction, every band
        if prev is not None:
            assert np.all(est >= prev - 0.2), (a, est, prev)
        prev = est
        if a <= 0.1:
            assert np.all(np.abs(est[1:] - true_db[1:]) <= 4.0), (
                f"a={a}: d4c {est} vs true {true_db}")

    # unvoiced frames are fully aperiodic (0 dB)
    x, _ = _voice_like(f0_val, 0.1, rng)
    bap = np.asarray(d4c(x, np.zeros(n_frames, np.float32), fs=SR,
                         frame_period_ms=HOP_MS))
    assert np.all(bap == 0.0)

    # pure noise fails the LoveTrain gate even with a (wrong) f0 track
    noise = rng.normal(size=SR * 2).astype(np.float32)
    bap = np.asarray(d4c(noise, f0_track, fs=SR, frame_period_ms=HOP_MS))
    assert np.all(bap[20:-20] >= -1.0)


def test_band_aperiodicity_beats_d4c_calibration():
    """The measured comparison behind the default-bap choice: on the
    voice-like grid, band_aperiodicity's RMS error against the true
    per-band noise ratios must stay well below true-D4C's."""
    from serenade_tpu.ops.world import band_aperiodicity, d4c

    rng = np.random.default_rng(42)
    n_frames = int(SR * 2 / (SR * HOP_MS / 1000))
    errs_bandap, errs_d4c = [], []
    for f0_val in (150.0, 300.0):
        f0_track = np.full(n_frames, f0_val, np.float32)
        for a in (0.01, 0.1, 0.3):
            x, true_db = _voice_like(f0_val, a, rng)
            e_b = np.asarray(band_aperiodicity(
                x, f0_track, fs=SR, frame_period_ms=HOP_MS))[20:-20].mean(0)
            e_d = np.asarray(d4c(
                x, f0_track, fs=SR, frame_period_ms=HOP_MS))[20:-20].mean(0)
            errs_bandap.extend(np.abs(e_b - true_db))
            errs_d4c.extend(np.abs(e_d - true_db))
    rms_b = float(np.sqrt(np.mean(np.square(errs_bandap))))
    rms_d = float(np.sqrt(np.mean(np.square(errs_d4c))))
    print(f"bap-vs-truth RMS: bandap {rms_b:.2f} dB, d4c {rms_d:.2f} dB")
    assert rms_b <= 1.0, rms_b          # the tightened calibration bound
    assert rms_b < 0.5 * rms_d, (rms_b, rms_d)
