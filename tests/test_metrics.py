"""Objective evaluation metrics (serenade_tpu/metrics.py + bin/evaluate).

Analytic signals with known relationships pin each metric: identical
signals score ~0, a pitch shift of K cents reads back as ~K cents of
log-F0 RMSE, additive noise raises MCD, and DTW absorbs a global time
offset that index-paired MCD mistakes for spectral error.
"""

import json
import sys

import numpy as np
import pytest

from serenade_tpu.metrics import (
    cosine_similarity, dtw_path, evaluate_pair, extract_eval_feats,
    f0_rmse_cents, mel_cepstral_distortion, summarize, vuv_error_rate,
)
from tests.test_serving import tiny_experiment  # noqa: F401 (fixture)

SR = 24000
DUR = 1.2


def _tone(freq, dur=DUR, vibrato=False, noise=1e-3, seed=0):
    t = np.arange(int(SR * dur)) / SR
    f = np.full(len(t), float(freq))
    if vibrato:
        f = f * (1.0 + 0.01 * np.sin(2 * np.pi * 5 * t))
    wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / SR)
    if noise:  # a broadband floor, like any real recording
        wav = wav + noise * np.random.default_rng(seed).normal(
            size=len(wav))
    return wav.astype(np.float32)


def test_dtw_path_identity_and_offset():
    # diagonal-dominant cost: path follows the diagonal
    n = 20
    cost = np.ones((n, n)) + 5.0 * (1 - np.eye(n))
    i, j = dtw_path(cost)
    assert (i == j).all()
    # rectangular: path is monotone and covers both ends
    cost = np.abs(np.subtract.outer(np.arange(10) * 2.0, np.arange(20)))
    i, j = dtw_path(cost)
    assert i[0] == 0 and j[0] == 0 and i[-1] == 9 and j[-1] == 19
    assert (np.diff(i) >= 0).all() and (np.diff(j) >= 0).all()


def test_identical_signals_score_zero():
    wav = _tone(262.0, vibrato=True)
    m = evaluate_pair(wav, wav, SR)
    # DTW can wander through near-identical stationary frames, so the
    # self-MCD is tiny rather than exactly zero
    assert m["mcd_db"] < 0.05
    assert m["f0_rmse_cents"] == 0.0
    assert m["vuv_error"] == 0.0
    assert m["frames"] > 100
    assert mel_cepstral_distortion(
        extract_eval_feats(wav, SR)["mcep"],
        extract_eval_feats(wav, SR)["mcep"], use_dtw=False) == 0.0


def test_pitch_shift_reads_back_in_cents():
    shift_cents = 100.0
    a = _tone(262.0)
    b = _tone(262.0 * 2 ** (shift_cents / 1200.0))
    fa = extract_eval_feats(a, SR)
    fb = extract_eval_feats(b, SR)
    rmse = f0_rmse_cents(fa["f0"], fb["f0"])
    assert rmse == pytest.approx(shift_cents, abs=15.0)
    assert vuv_error_rate(fa["f0"], fb["f0"]) < 0.1


def test_noise_raises_mcd():
    base = extract_eval_feats(_tone(262.0, noise=0.005), SR)
    mcds = []
    for noise in (0.02, 0.1):
        f_noisy = extract_eval_feats(_tone(262.0, noise=noise, seed=1), SR)
        mcds.append(mel_cepstral_distortion(base["mcep"],
                                            f_noisy["mcep"]))
    assert 0.0 < mcds[0] < mcds[1]


def test_dtw_absorbs_time_offset():
    wav = _tone(262.0, dur=1.0, vibrato=True)
    # same audio arriving 150 ms late (leading near-silence)
    pad = np.full(int(0.15 * SR), 1e-4, np.float32)
    shifted = np.concatenate([pad, wav[: len(wav) - len(pad)]])
    fa = extract_eval_feats(wav, SR)
    fb = extract_eval_feats(shifted, SR)
    mcd_dtw = mel_cepstral_distortion(fa["mcep"], fb["mcep"], use_dtw=True)
    mcd_raw = mel_cepstral_distortion(fa["mcep"], fb["mcep"], use_dtw=False)
    assert mcd_dtw < 0.6 * mcd_raw


def test_dtw_aligns_f0_and_vuv_too():
    """Under use_dtw every metric rides the ONE cepstral alignment: a
    parallel rendition arriving 150 ms late must not read as hundreds of
    cents of F0 error or V/UV disagreement (index pairing does both)."""
    from serenade_tpu.metrics import pair_metrics

    wav = _tone(262.0, dur=1.0, vibrato=True)
    pad = np.full(int(0.15 * SR), 1e-4, np.float32)
    shifted = np.concatenate([pad, wav[: len(wav) - len(pad)]])
    fa = extract_eval_feats(wav, SR)
    fb = extract_eval_feats(shifted, SR)
    aligned = pair_metrics(fa, fb, use_dtw=True)
    raw = pair_metrics(fa, fb, use_dtw=False)
    # index pairing compares vibrato phases 150 ms apart; the cepstral
    # alignment (approximate on a stationary tone — the envelope barely
    # distinguishes frames) still recovers most of it
    assert aligned["f0_rmse_cents"] < 0.75 * raw["f0_rmse_cents"]
    assert aligned["f0_rmse_cents"] < 12.0
    assert aligned["vuv_error"] <= raw["vuv_error"]


def test_corrupt_waveform_rejected_not_nan():
    """A NaN wav raises (solo) / skips with None (batch) instead of
    poisoning the corpus summary with NaN means."""
    from serenade_tpu.metrics import extract_eval_feats_batch

    good = _tone(262.0, dur=0.5)
    bad = good.copy()
    bad[100:200] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        extract_eval_feats(bad, SR)
    out = extract_eval_feats_batch([good, bad, good], SR)
    assert out[1] is None
    assert out[0] is not None and out[2] is not None
    np.testing.assert_allclose(out[0]["mcep"], out[2]["mcep"])


def test_stereo_wavs_fold_to_mono():
    """(T, 2) inputs (stereo corpus files) must analyze like their mono
    mixdown instead of shape-erroring in the jitted analysis."""
    wav = _tone(262.0)
    stereo = np.stack([wav, wav], axis=1)
    m = evaluate_pair(stereo, wav, SR)
    assert m["mcd_db"] < 0.05
    assert m["vuv_error"] == 0.0


def test_dtw_band_still_absorbs_offsets():
    """The Sakoe-Chiba band must not clip a 15% global offset."""
    n = 200
    rng = np.random.default_rng(0)
    base = np.cumsum(rng.normal(size=(n + 30, 4)), axis=0)  # aperiodic
    a, b = base[30:], base[:n]  # a[i] == b[i + 30]
    sq = (np.sum(a**2, 1)[:, None] + np.sum(b**2, 1)[None, :]
          - 2 * (a @ b.T))
    i, j = dtw_path(np.sqrt(np.maximum(sq, 0)))
    assert i[0] == 0 and i[-1] == n - 1 and j[-1] == n - 1
    # the matched region aligns at the 30-frame lag
    lags = (j - i)[len(i) // 4: -len(i) // 4]
    assert np.median(lags) == pytest.approx(30, abs=2)


def test_batch_extraction_matches_solo():
    """extract_eval_feats_batch must be row-identical to the solo path
    (same padded shapes through the vmapped program)."""
    from serenade_tpu.metrics import extract_eval_feats_batch

    wavs = [_tone(262.0), _tone(330.0, seed=1), _tone(294.0, dur=2.0)]
    batch = extract_eval_feats_batch(wavs, SR)
    for wav, fb in zip(wavs, batch):
        fa = extract_eval_feats(wav, SR)
        np.testing.assert_allclose(fb["f0"], fa["f0"], atol=1e-4)
        np.testing.assert_allclose(fb["mcep"], fa["mcep"], atol=1e-4)
        assert fb["mcep"].shape == fa["mcep"].shape


def test_f0_rmse_none_when_unvoiced():
    silence = np.zeros(200, np.float32)
    assert f0_rmse_cents(silence, silence) is None
    s = summarize({"u": {"mcd_db": 1.0, "f0_rmse_cents": None,
                         "vuv_error": 0.0}})
    assert s["n_utts"] == 1 and "f0_rmse_cents" not in s


def test_style_embedding_similarity(tiny_experiment):  # noqa: F811
    """GST-embedding cosine: identical references score ~1; a different
    style's reference scores lower; the waveform path lands near the
    logmel path for the same audio."""
    conv, items = tiny_experiment
    keys = list(items)
    mel1 = items[keys[0]]["logmel"]
    mel2 = items[keys[1]]["logmel"]
    e1 = conv.style_embedding(logmel=mel1)
    assert e1.ndim == 1 and np.isfinite(e1).all()
    self_cos = cosine_similarity(e1, conv.style_embedding(logmel=mel1))
    assert self_cos > 0.9999
    cross_cos = cosine_similarity(e1, conv.style_embedding(logmel=mel2))
    assert cross_cos < self_cos
    # waveform front-end: same utterance through audio vs its dumped
    # logmel must agree far better than different utterances do
    wav = np.asarray(items[keys[0]]["wave"])
    e1_wav = conv.style_embedding(wav=wav, sr=24000)
    assert cosine_similarity(e1, e1_wav) > cross_cos


def test_evaluate_cli_style_similarity(tiny_experiment, tmp_path,  # noqa: F811
                                       monkeypatch, capsys):
    import sys as _sys

    from serenade_tpu.bin.evaluate import main
    from serenade_tpu.utils.audio import write_wav
    from serenade_tpu.utils.h5 import write_hdf5

    conv, items = tiny_experiment
    expdir, stats = conv._paths
    keys = list(items)
    ref_h5 = tmp_path / "ref.h5"
    write_hdf5(str(ref_h5), "logmel", items[keys[0]]["logmel"])
    ref_dict = tmp_path / "refstyles.json"
    ref_dict.write_text(json.dumps({"Breathy": str(ref_h5)}))

    convd = tmp_path / "conv"
    tgtd = tmp_path / "tgt"
    convd.mkdir()
    tgtd.mkdir()
    write_wav(str(convd / "u_Breathy.wav"), _tone(220.0), SR)
    write_wav(str(convd / "u_Breathy_custom.wav"), _tone(220.0), SR)
    write_wav(str(convd / "u_nomatch.wav"), _tone(220.0), SR)
    write_wav(str(tgtd / "u.wav"), _tone(220.0), SR)
    write_wav(str(tgtd / "u_nomatch.wav"), _tone(220.0), SR)

    out_json = tmp_path / "res.json"
    monkeypatch.setattr(_sys, "argv", [
        "evaluate", "--converted-dir", str(convd),
        "--target-dir", str(tgtd), "--expdir", expdir, "--stats", stats,
        "--ref-dict", str(ref_dict), "--out", str(out_json),
        "--strip-suffixes", "_custom", "_Breathy",
    ])
    main()
    full = json.loads(out_json.read_text())
    per = full["per_utterance"]
    cos = per["u_Breathy"]["style_cos"]
    assert cos is not None and -1.0 <= cos <= 1.0
    # custom post-style suffixes (like stage 9's _sifigan) still resolve
    # the style tag for scoring
    assert per["u_Breathy_custom"]["style_cos"] is not None
    # stems without a known style tag carry no style score
    assert per["u_nomatch"]["style_cos"] is None
    assert "style_cos" in full["summary"]


def test_evaluate_cli_pairs_and_reports(tmp_path, monkeypatch, capsys):
    from serenade_tpu.bin.evaluate import main
    from serenade_tpu.utils.audio import write_wav

    conv = tmp_path / "converted"
    tgt = tmp_path / "targets"
    conv.mkdir()
    tgt.mkdir()
    write_wav(str(conv / "utt1_Breathy.wav"), _tone(262.0), SR)
    write_wav(str(conv / "utt2_sifigan.wav"), _tone(330.0), SR)
    write_wav(str(conv / "utt1_gt.wav"), _tone(999.0), SR)  # excluded
    write_wav(str(tgt / "utt1.wav"), _tone(262.0), SR)
    write_wav(str(tgt / "utt2.wav"),
              _tone(330.0 * 2 ** (50.0 / 1200.0)), SR)

    out_json = tmp_path / "results.json"
    monkeypatch.setattr(sys, "argv", [
        "evaluate", "--converted-dir", str(conv), "--target-dir", str(tgt),
        "--out", str(out_json),
    ])
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_utts"] == 2
    assert summary["mcd_db"] >= 0.0
    full = json.loads(out_json.read_text())
    per = full["per_utterance"]
    assert set(per) == {"utt1_Breathy", "utt2_sifigan"}
    # utt1 is identical to its target; utt2 is 50 cents off
    assert per["utt1_Breathy"]["mcd_db"] < 0.05
    assert per["utt2_sifigan"]["f0_rmse_cents"] == pytest.approx(50.0,
                                                                 abs=15.0)
