#!/usr/bin/env python
"""Quantify the live-duplex lag/quality frontier (VERDICT r3 item 6).

The live duplex endpoint (``Converter.convert_wav_stream_live``) trades
output lag for boundary accuracy through three knobs — conversion
``chunk_frames``, extraction context ``extract_ctx_frames``, and
crossfade ``overlap_frames``.  The lag ladder was measured in round 3
(BASELINE.md live-duplex row: 512/256/64 → +3.0 s behind live,
128/64/32 → +1.10 s, 64/32/16 → +0.61 s) but the QUALITY cost per rung
was only characterized structurally.  This script measures it as MCD:

- train a small Serenade end-to-end through the real CLIs on a
  synthetic parallel corpus (CPU; deterministic local content features
  honoring the real ContentVec frame contract),
- convert held-out sources OFFLINE (one-shot ``convert_features``, the
  quality ceiling) and LIVE at each ladder rung,
- report mel-cepstral distortion (DCT cepstra, c0 excluded — the same
  proxy tests/test_distill.py pins few-step samplers with) of each rung
  vs offline, next to the stochastic floor (offline vs offline under a
  different CFM noise draw — the component no windowing can remove).

The decision rule (VERDICT): the smallest-lag rung whose MCD-vs-offline
is within 0.5 dB of the default rung's becomes the shipped default.

Run in a fresh process (it forces JAX onto CPU before first JAX touch):

    python scripts/live_ladder_quality.py --train-steps 600 --seconds 16

Emits a markdown table and ONE final JSON line.
"""

import argparse
import json
import os
import sys
import tempfile

# the live ladder is a CPU measurement and must never contend with (or
# wedge on) a tunneled TPU.  sitecustomize may have imported jax already
# (env vars are too late) — switch the platform via jax.config before the
# first client init, the tests/conftest.py pattern.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/serenade_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

SR = 24000
CONTENT_DIM = 16
# (chunk_frames, extract_ctx_frames, overlap_frames) — the measured lag
# ladder plus one intermediate rung; lags from BASELINE.md (30 s
# real-time-paced live bench, warm).
LADDER = [
    (512, 256, 64, 3.0),
    (256, 128, 48, None),  # intermediate; lag interpolates ~1.9 s
    (128, 64, 32, 1.10),
    (64, 32, 16, 0.61),
]

_PROJ = np.random.default_rng(7).normal(size=(400, CONTENT_DIM)) * 0.05


def local_content_fn(audio16k):
    """Deterministic content features honoring the real ContentVec frame
    contract ((n-400)//160+1 frames of 400-sample windows at 160 hop) but
    computed locally — windowed extraction must slice to the same values
    as full extraction, so rung differences isolate the conversion-side
    windowing, exactly like production (where ContentVec boundary
    sensitivity additionally blends away in the crossfade)."""
    a = np.asarray(audio16k, np.float64)
    n = max((len(a) - 400) // 160 + 1, 1)
    idx = np.arange(n)[:, None] * 160 + np.arange(400)[None, :]
    pad = np.pad(a, (0, max(0, idx.max() + 1 - len(a))))
    return (pad[idx] @ _PROJ).astype(np.float32)


def synth_voice(seconds, base, tilt, seed):
    """Harmonic note sequence with style-dependent spectral tilt — mel
    structure rich enough that conversion errors show up in cepstra."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    ratios = [1.0, 9 / 8, 5 / 4, 4 / 3, 3 / 2]
    seg = np.minimum((t * 1.25).astype(int) % len(ratios), len(ratios) - 1)
    f = base * np.asarray(ratios)[seg]
    f = f * (1.0 + 0.008 * np.sin(2 * np.pi * 5.2 * t))
    phase = 2 * np.pi * np.cumsum(f) / SR
    wav = np.zeros_like(t)
    for h in range(1, 9):
        wav += (h ** tilt) * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    wav /= np.max(np.abs(wav))
    wav = 0.5 * wav + 2e-3 * rng.normal(size=len(wav))
    return wav.astype(np.float32)


def mcd_db(a, b):
    """DCT-cepstral distortion in dB over log-mel frames, c0 excluded."""
    import scipy.fft

    ca = scipy.fft.dct(np.asarray(a, np.float64), type=2, axis=-1,
                       norm="ortho")
    cb = scipy.fft.dct(np.asarray(b, np.float64), type=2, axis=-1,
                       norm="ortho")
    d = ca[:, 1:] - cb[:, 1:]
    return float(np.mean(10.0 / np.log(10.0)
                         * np.sqrt(2.0 * np.sum(d * d, axis=-1))))


def build_experiment(workdir, train_steps, n_utts=8, utt_seconds=4.0):
    """Synthetic corpus → real preprocess/statistics/train CLIs → a
    Converter on the trained checkpoint (the tests' tiny-experiment
    pattern, with a longer budget so the flow is meaningfully trained)."""
    import yaml

    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_train import main as train_main
    from serenade_tpu.features import FeatureConfig, extract_features
    from serenade_tpu.utils.h5 import write_hdf5

    config = dict(
        sampling_rate=SR, fft_size=512, hop_size=240, win_length=480,
        shiftms=10, num_mels=32, fmin=63, fmax=11000, eps=1.0e-6,
        model_type="Serenade",
        model_params=dict(
            input_dim=CONTENT_DIM, output_dim=32, encoder_channels=32,
            decoder_channels=64, gst_embed_dim=32,
            decoder_attention_head_dim=64, dtype="float32"),
        trainer_type="SSCTrainer", collater_type="SSCCollater",
        score_type="est_lf0_score", logmel_type="logmel",
        batch_size=4,
        optimizer_type="AdamW", optimizer_params=dict(lr=1.0e-3),
        grad_norm=1.0,
        scheduler_type="MultiStepLR",
        scheduler_params=dict(gamma=0.5, milestones=[100000]),
        train_max_steps=train_steps,
        save_interval_steps=10 ** 6, eval_interval_steps=10 ** 6,
        log_interval_steps=max(train_steps // 4, 1),
        num_save_intermediate_results=1,
    )
    fc = FeatureConfig.from_dict(config)
    dump = os.path.join(workdir, "dump")
    os.makedirs(dump, exist_ok=True)
    styles = [(220.0, -0.8), (262.0, -1.6), (294.0, -1.2), (330.0, -2.0)]
    items = {}
    for i in range(n_utts):
        base, tilt = styles[i % len(styles)]
        wav = synth_voice(utt_seconds, base, tilt, seed=100 + i)
        utt = f"utt{i:02d}"
        feats = extract_features(utt, wav, SR, fc,
                                 content_fn=local_content_fn)
        for k, v in feats.items():
            write_hdf5(os.path.join(dump, f"{utt}.h5"), k, v)
        feats["score"] = feats["est_lf0_score"]
        items[utt] = feats

    cfg_path = os.path.join(workdir, "config.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    def run_cli(main_fn, argv):
        old = sys.argv
        sys.argv = ["prog"] + argv
        try:
            main_fn()
        finally:
            sys.argv = old

    run_cli(stats_main, ["--rootdir", dump, "--dumpdir", workdir,
                         "--config", cfg_path])
    run_cli(train_main, [
        "--train-dumpdir", dump, "--dev-dumpdir", dump,
        "--stats", os.path.join(workdir, "stats.joblib"),
        "--outdir", os.path.join(workdir, "exp"),
        "--config", cfg_path, "--data-axis", "1"])

    from serenade_tpu.api import Converter

    conv = Converter(os.path.join(workdir, "exp"),
                     os.path.join(workdir, "stats.joblib"), n_timesteps=10)
    conv._content_fn = local_content_fn
    return conv, items


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--seconds", type=float, default=16.0,
                    help="held-out source length")
    ap.add_argument("--n-sources", type=int, default=3)
    ap.add_argument("--n-seeds", type=int, default=2)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import jax

    workdir = args.workdir or tempfile.mkdtemp(prefix="live_ladder_")
    print(f"workdir: {workdir}")
    conv, items = build_experiment(workdir, args.train_steps)
    ref = items[list(items)[1]]

    sources = [synth_voice(args.seconds, base, tilt, seed=900 + i)
               for i, (base, tilt) in enumerate(
                   [(247.0, -1.0), (277.0, -1.8), (311.0, -1.4)]
                   [:args.n_sources])]

    def offline(wav, seed):
        feats = conv.extract_from_wav(wav, SR, "src")
        conv._key = jax.random.key(seed)
        mel, _, _ = conv.convert_features(feats, ref)
        return np.asarray(mel)

    def live(wav, seed, chunk, ctx, ov):
        conv._key = jax.random.key(seed)
        pieces = [wav[i:i + 2400] for i in range(0, len(wav), 2400)]
        segs = conv.convert_wav_stream_live(
            iter(pieces), SR, ref, chunk_frames=chunk, overlap_frames=ov,
            extract_ctx_frames=ctx)
        return np.concatenate([m for _, m, _ in segs], axis=0)

    # seeds are INDEPENDENT between the offline reference, the second
    # offline draw (floor), and each live rung — any sharing correlates
    # the CFM noise draws and deflates the measured distance
    floor, rung_mcd = [], {r[:3]: [] for r in LADDER}
    for si, wav in enumerate(sources):
        for seed in range(args.n_seeds):
            off = offline(wav, 10_000 + 977 * si + seed)
            off2 = offline(wav, 20_000 + 977 * si + seed)
            n = min(len(off), len(off2))
            floor.append(mcd_db(off[:n], off2[:n]))
            print(f"  src{si} seed{seed}: floor "
                  f"{floor[-1]:.3f} dB", flush=True)
            for ri, (chunk, ctx, ov, _lag) in enumerate(LADDER):
                lv = live(wav, 50_000 + 977 * si + 31 * ri + seed,
                          chunk, ctx, ov)
                assert abs(len(lv) - len(off)) <= 2, (len(lv), len(off))
                n = min(len(lv), len(off))
                m = mcd_db(lv[:n], off[:n])
                rung_mcd[(chunk, ctx, ov)].append(m)
                print(f"    rung {chunk}/{ctx}/{ov}: {m:.3f} dB",
                      flush=True)

    floor_m = float(np.mean(floor))
    print(f"\nstochastic floor (offline vs offline, new noise draw): "
          f"{floor_m:.3f} dB\n")
    print("| chunk/ctx/overlap | lag behind live | MCD vs offline (dB) | "
          "over floor (dB) |")
    print("|---|---|---|---|")
    rows = []
    for chunk, ctx, ov, lag in LADDER:
        m = float(np.mean(rung_mcd[(chunk, ctx, ov)]))
        lag_s = f"+{lag:.2f} s" if lag else "~"
        print(f"| {chunk}/{ctx}/{ov} | {lag_s} | {m:.3f} | "
              f"{m - floor_m:+.3f} |")
        rows.append(dict(chunk=chunk, ctx=ctx, overlap=ov,
                         lag_s=lag, mcd_db=round(m, 4),
                         over_floor_db=round(m - floor_m, 4)))
    default = rows[0]
    pick = default
    for r in rows:
        if r["mcd_db"] <= default["mcd_db"] + 0.5:
            pick = r  # rows are ordered largest→smallest lag
    print(f"\npick (smallest lag within +0.5 dB of the "
          f"{default['chunk']}/{default['ctx']}/{default['overlap']} "
          f"rung): {pick['chunk']}/{pick['ctx']}/{pick['overlap']}")
    print(json.dumps(dict(floor_mcd_db=round(floor_m, 4), rungs=rows,
                          pick=pick, train_steps=args.train_steps,
                          seconds=args.seconds)))


if __name__ == "__main__":
    main()
