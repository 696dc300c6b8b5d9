"""End-to-end slice test (SURVEY §7.3): synthetic wavs → feature dumps →
scaler statistics → a few training steps → checkpoint → decode to mel.

Runs the real CLIs (monkeypatched argv) with a tiny model config on the
virtual CPU mesh.  A fake 16-d content extractor stands in for ContentVec
(whose pretrained weights don't exist offline)."""

import json
import os
import sys

import numpy as np
import pytest
import yaml

from serenade_tpu.features import FeatureConfig, extract_features
from serenade_tpu.utils.audio import write_wav
from serenade_tpu.utils.h5 import read_hdf5, write_hdf5

SR = 24000
CONTENT_DIM = 16

TINY_CONFIG = dict(
    sampling_rate=SR,
    fft_size=512,
    hop_size=240,
    win_length=480,
    shiftms=10,
    num_mels=16,
    fmin=63,
    fmax=11000,
    eps=1.0e-6,
    model_type="Serenade",
    model_params=dict(
        input_dim=CONTENT_DIM,
        output_dim=16,
        encoder_channels=16,  # prior loss ties encoder output to logmel
        decoder_channels=32,
        gst_embed_dim=16,
        decoder_attention_head_dim=16,
        dtype="float32",
    ),
    trainer_type="SSCTrainer",
    collater_type="SSCCollater",
    score_type="est_lf0_score",
    logmel_type="logmel",
    batch_size=1,  # global batch = 1 * data_axis(2) = 2 of the 3 utts
    optimizer_type="AdamW",
    optimizer_params=dict(lr=1.0e-4),
    grad_norm=1.0,
    scheduler_type="MultiStepLR",
    scheduler_params=dict(gamma=0.5, milestones=[100]),
    train_max_steps=2,
    save_interval_steps=1000,
    eval_interval_steps=1000,
    log_interval_steps=1,
    num_save_intermediate_results=1,
    # exercise the input-pipeline knobs through the real CLI: spawn-process
    # item fetch (GIL-free decode+normalize) and bf16 host batches
    num_workers=2,
    loader_worker_type="process",
    host_batch_dtype="bfloat16",
)


def fake_content_fn(audio16k):
    """Deterministic 16-d pseudo-content at 10 ms frames."""
    n = len(audio16k) // 160
    rng = np.random.default_rng(abs(int(audio16k[:100].sum() * 1e6)) % 2**31)
    return rng.normal(size=(n, CONTENT_DIM)).astype(np.float32)


def synth_wav(path, freq, dur=1.2):
    t = np.arange(int(SR * dur)) / SR
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5 * t)
    wav = 0.4 * np.sin(2 * np.pi * freq * vibrato * t)
    write_wav(path, wav.astype(np.float32), SR)


UTTS = [
    ("EN_s1_a_Breathy_Group_1", 220.0),
    ("EN_s1_b_Falsetto_Group_1", 330.0),
    ("EN_s1_c_Pharyngeal_Group_1", 262.0),
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    wavdir = root / "wav"
    dumpdir = root / "dump"
    wavdir.mkdir()
    dumpdir.mkdir()

    fc = FeatureConfig.from_dict(TINY_CONFIG)
    for utt, freq in UTTS:
        wav_path = wavdir / f"{utt}.wav"
        synth_wav(str(wav_path), freq)
        from serenade_tpu.utils.audio import read_wav

        audio, fs = read_wav(str(wav_path))
        feats = extract_features(
            utt, audio, fs, fc, content_fn=fake_content_fn,
        )
        assert feats is not None, f"feature extraction dropped {utt}"
        for k, v in feats.items():
            write_hdf5(str(dumpdir / f"{utt}.h5"), k, v)

    cfg_path = root / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    return root


def test_feature_dump_contract(workdir):
    h5 = str(workdir / "dump" / f"{UTTS[0][0]}.h5")
    keys = ["wave", "hubert", "logmel", "loud", "gt_lf0_score",
            "est_lf0_score", "f0", "vuv", "midi"]
    arrays = {k: read_hdf5(h5, k) for k in keys}
    frame_lens = {k: len(v) for k, v in arrays.items() if k != "wave"}
    assert len(set(frame_lens.values())) == 1, frame_lens
    assert arrays["logmel"].shape[1] == TINY_CONFIG["num_mels"]
    assert arrays["hubert"].shape[1] == CONTENT_DIM
    # sine at 220 Hz: F0 should be detected around it
    f0 = arrays["f0"][:, 0]
    voiced = f0[f0 > 0]
    assert len(voiced) > 30
    assert abs(np.median(voiced) - 220.0) < 8.0
    # est score should quantize near A3 = 57
    midi = arrays["midi"][:, 0]
    assert abs(np.median(midi[midi > 0]) - 57) <= 1


def _run_cli(main_fn, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main_fn()
    finally:
        sys.argv = old


def test_stats_train_decode(workdir):
    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_train import main as train_main
    from serenade_tpu.bin.ssc_decode import main as decode_main
    from serenade_tpu.checkpoint import find_latest_checkpoint

    dump = str(workdir / "dump")
    statsdir = str(workdir / "stats")
    expdir = str(workdir / "exp")
    outdir = str(workdir / "decoded")
    cfg = str(workdir / "config.yml")

    _run_cli(stats_main, ["--rootdir", dump, "--dumpdir", statsdir,
                          "--config", cfg])
    stats_path = os.path.join(statsdir, "stats.joblib")
    assert os.path.exists(stats_path)

    _run_cli(train_main, [
        "--train-dumpdir", dump, "--dev-dumpdir", dump,
        "--stats", stats_path, "--outdir", expdir, "--config", cfg,
        "--data-axis", "2",  # 2-device dp on the virtual CPU mesh
        "--zero1",  # CLI wiring for optimizer-state sharding (numerics
        # proven equal in test_parallel; here it must train+resume+decode)
    ])
    ckpt = find_latest_checkpoint(expdir)
    assert ckpt is not None
    assert os.path.exists(os.path.join(expdir, "config.yml"))

    _run_cli(decode_main, [
        "--dumpdir", dump, "--stats", stats_path, "--outdir", outdir,
        "--checkpoint", ckpt, "--n-timesteps", "2", "--batch-size", "2",
        "--data-axis", "2",  # mesh-dp decode on the virtual CPU devices
    ])
    decoded = [f for f in os.listdir(outdir) if f.endswith(".h5")]
    assert decoded, "no decoded outputs written"
    one = os.path.join(outdir, decoded[0])
    mel = read_hdf5(one, "mel")
    lf0 = read_hdf5(one, "lf0")
    assert mel is not None and mel.shape[1] == TINY_CONFIG["num_mels"]
    assert lf0 is not None and (lf0 > 0).any()
    assert np.isfinite(mel).all()

    # sharded array-job decode (run.sh stages 4/5/8 --num-shards): the
    # two shards' outputs must union to the unsharded set
    sharded_out = outdir + "_sharded"
    for shard in ("1", "2"):
        _run_cli(decode_main, [
            "--dumpdir", dump, "--stats", stats_path,
            "--outdir", sharded_out, "--checkpoint", ckpt,
            "--n-timesteps", "2", "--num-shards", "2", "--shard", shard,
        ])
    full = {f for f in os.listdir(outdir) if f.endswith(".h5")}
    sharded = {f for f in os.listdir(sharded_out) if f.endswith(".h5")}
    assert sharded == full, (sharded, full)


def test_distill_cli(workdir):
    """serenade-distill on the trained tiny checkpoint: produces a
    decode-compatible distilled checkpoint whose config defaults decode
    to the few-step sampler (runs after test_stats_train_decode, reusing
    its experiment)."""
    from serenade_tpu.bin.distill import main as distill_main
    from serenade_tpu.bin.ssc_decode import main as decode_main
    from serenade_tpu.checkpoint import find_latest_checkpoint
    from serenade_tpu.config import load_config

    dump = str(workdir / "dump")
    expdir = str(workdir / "exp")
    stats_path = str(workdir / "stats" / "stats.joblib")
    teacher = find_latest_checkpoint(expdir)
    if teacher is None:
        pytest.skip("teacher checkpoint missing (train test did not run)")
    distdir = str(workdir / "exp_distilled")

    _run_cli(distill_main, [
        "--teacher-checkpoint", teacher,
        "--config", os.path.join(expdir, "config.yml"),
        "--train-dumpdir", dump, "--stats", stats_path,
        "--outdir", distdir, "--distill-steps", "3",
        "--teacher-steps", "2", "--student-steps", "1",
        "--data-axis", "2",  # global batch 2 fits the 3-utt tiny dump
    ])
    ckpt = find_latest_checkpoint(distdir)
    assert ckpt is not None
    cfg = load_config(os.path.join(distdir, "config.yml"))
    assert cfg.get("distilled") is True
    assert int(cfg["inference_n_timesteps"]) == 1

    # decode WITHOUT --n-timesteps: must pick up the distilled default
    outdir = str(workdir / "decoded_distilled")
    _run_cli(decode_main, [
        "--dumpdir", dump, "--stats", stats_path, "--outdir", outdir,
        "--checkpoint", ckpt,
    ])
    decoded = [f for f in os.listdir(outdir) if f.endswith(".h5")]
    assert decoded, "no decoded outputs from the distilled checkpoint"
    mel = read_hdf5(os.path.join(outdir, decoded[0]), "mel")
    assert np.isfinite(mel).all()


def test_batched_extraction_matches_per_utt():
    """extract_features_batch must reproduce extract_features exactly:
    same-bucket same-range utterances share one vmapped dispatch but the
    padded shapes (and thus every numeric) are identical."""
    from serenade_tpu.features import extract_features_batch

    rng = np.random.default_rng(11)
    fc = FeatureConfig(num_mels=16)
    sr = fc.sampling_rate
    items = []
    for i, dur in enumerate((0.5, 0.6, 1.4)):  # two share the 128-frame
        t = np.arange(int(dur * sr)) / sr      # bucket, one does not
        wav = (0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)
               + 0.01 * rng.normal(size=t.shape)).astype(np.float32)
        items.append((f"utt{i}", wav, sr, None))

    # content fn with a .batch attribute, like make_content_fn's
    fake_content_fn.batch = lambda audios: [fake_content_fn(a) for a in audios]
    try:
        solo = {
            utt: extract_features(utt, wav, fs, fc, gt_note_seq=g,
                                  content_fn=fake_content_fn)
            for utt, wav, fs, g in items
        }
        batched = extract_features_batch(items, fc, max_group=8,
                                         content_fn=fake_content_fn)
    finally:
        del fake_content_fn.batch

    assert set(batched) == set(solo)
    for utt in solo:
        for key in solo[utt]:
            np.testing.assert_array_equal(
                batched[utt][key], solo[utt][key],
                err_msg=f"{utt}/{key} differs between batched and solo",
            )


def test_f0_range_override_bounds_search():
    """Explicit f0_range (the serving-side stand-in for the reference's
    per-voice-type conf/f0.yaml ranges) bounds the F0 search, and the
    batched path honors per-item ranges identically to the solo path."""
    from serenade_tpu.features import extract_features_batch

    fc = FeatureConfig(num_mels=16)
    sr = fc.sampling_rate
    t = np.arange(int(0.7 * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

    f_in = extract_features("u", wav, sr, fc, content_fn=fake_content_fn,
                            f0_range=(300.0, 600.0))
    voiced = f_in["f0"][f_in["vuv"].astype(bool).reshape(-1)]
    assert len(voiced) > 0
    assert abs(np.median(voiced) - 440.0) < 10.0

    # a range EXCLUDING the true pitch still respects its bounds: the
    # estimator either reports in-range candidates only (e.g. the
    # octave) or finds nothing voiced, in which case extraction skips
    # the utterance (None — the reference's no-voiced-frames semantics)
    f_hi = extract_features("u", wav, sr, fc, content_fn=fake_content_fn,
                            f0_range=(500.0, 1100.0))
    if f_hi is not None:
        voiced_hi = f_hi["f0"][f_hi["vuv"].astype(bool).reshape(-1)]
        if len(voiced_hi):
            assert voiced_hi.min() >= 500.0 * 0.95

    # batched per-item ranges == solo with the same range
    items = [("a", wav, sr, None), ("b", wav, sr, None)]
    got = extract_features_batch(
        items, fc, content_fn=fake_content_fn,
        f0_ranges=[(300.0, 600.0), None])
    np.testing.assert_array_equal(got["a"]["f0"], f_in["f0"])
    default = extract_features("b", wav, sr, fc,
                               content_fn=fake_content_fn)
    np.testing.assert_array_equal(got["b"]["f0"], default["f0"])


def test_int16_wire_routes_batch24_and_matches_f32():
    """wire_dtype="int16" (the serving opt-in) must (a) hand the RAW
    24 kHz audio to content_fn.batch24 — no host resample — and (b)
    reproduce the f32 path's signal features exactly when the audio sits
    on the PCM16 grid (read_wav's k/32768 values), the serving wire's
    lossless case."""
    from serenade_tpu.features import extract_features_batch

    fc = FeatureConfig(num_mels=16)
    sr = fc.sampling_rate
    assert sr == 24000  # batch24 routing is keyed on the 24 kHz config
    t = np.arange(int(0.7 * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    # snap to the PCM16 grid, as any wav-file-sourced request would be
    wav = (np.clip(np.round(wav * 32768.0), -32768, 32767)
           .astype(np.float32) / 32768.0)
    items = [("utt0", wav, sr, None)]

    seen = {}

    def batch24(audios24k, wire_dtype="float32"):
        seen["n"] = [len(a) for a in audios24k]
        seen["wire"] = wire_dtype
        return [fake_content_fn(a[: len(a) * 2 // 3]) for a in audios24k]

    fake_content_fn.batch24 = batch24
    try:
        got = extract_features_batch(items, fc, content_fn=fake_content_fn,
                                     wire_dtype="int16")
    finally:
        del fake_content_fn.batch24
    # batch24 gets the reflect-padded 24 kHz audio (same signal the host
    # path would resample), untouched by any host-side resample
    assert seen["n"] == [len(wav) + fc.fft_size]
    assert seen["wire"] == "int16"

    ref = extract_features_batch(items, fc, content_fn=fake_content_fn)
    for key in ("logmel", "loud", "f0"):
        np.testing.assert_array_equal(
            got["utt0"][key], ref["utt0"][key],
            err_msg=f"{key}: int16 wire is not lossless on the PCM16 grid")


def test_batched_extraction_skips_bad_item_alone():
    """A malformed waveform (unnormalized / NaN / empty) must skip ALONE
    (None, the per-utterance contract) — not fault the whole batch the
    serving dispatcher materializes for a window of concurrent clients."""
    from serenade_tpu.features import extract_features_batch

    fc = FeatureConfig(num_mels=16)
    sr = fc.sampling_rate
    t = np.arange(int(0.5 * sr)) / sr
    good = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    nan = good.copy()
    nan[10] = np.nan
    items = [
        ("good", good, sr, None),
        ("unnorm", (8.0 * good).astype(np.float32), sr, None),
        ("nan", nan, sr, None),
        ("empty", np.zeros(0, np.float32), sr, None),
    ]
    out = extract_features_batch(items, fc, content_fn=fake_content_fn)
    assert out["unnorm"] is None
    assert out["nan"] is None
    assert out["empty"] is None
    assert out["good"] is not None
    assert np.isfinite(out["good"]["logmel"]).all()
