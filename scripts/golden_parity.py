#!/usr/bin/env python3
"""Golden-parity harness (VERDICT r3 item 7): ONE command that, in an
environment with the golden packages / released artifacts, runs every
feature-extraction and checkpoint-converter comparison this framework's
validity story depends on, and emits one JSON verdict line.

This box has no network egress, so librosa / pyworld / the released
checkpoints (ref egs/gtsinger/ssc1/README.md:71-78, conf paths at
conf/serenade.yaml:42-45) are absent — every comparison that cannot run
reports ``skipped`` with the exact missing dependency, and the harness
exits 0 unless a check that DID run failed.  The moment an environment
provides the goldens, this is the single command that closes ROADMAP's
"last inch":

  python scripts/golden_parity.py \
      [--wav real.wav] \
      [--serenade-ckpt checkpoint-600000steps.pkl] \
      [--hifigan-ckpt hifigan.pkl --hifigan-config config.yml] \
      [--sifigan-ckpt sifigan.pkl] \
      [--contentvec-ckpt contentvec.pt] \
      [--transcriber-ckpt midi_model.pt]

Checks:
  mel          ops/mel.logmelfilterbank  vs librosa STFT+mel pipeline
               (ref bin/preprocess.py:141-205)
  loudness     ops/mel.loudness_extract  vs librosa perceptual weighting
               (ref bin/preprocess.py:126-138)
  f0_harvest   ops/harvest.harvest_f0    vs pyworld.harvest
               (ref bin/preprocess.py:485-493)
  cheaptrick   ops/world.cheaptrick      vs pyworld.cheaptrick
               (ref bin/ssc_postprocessing.py anasyn path)
  d4c_bap      ops/world.band_aperiodicity vs pyworld.d4c coded bands
  ckpt_serenade   models/convert_serenade vs the released .pkl, forward
                  parity against the pip-installed reference package
  ckpt_hifigan    vocoder/convert vs the released HiFiGAN checkpoint,
                  forward parity against parallel_wavegan
  ckpt_sifigan    sifigan/convert vs the released SiFiGAN checkpoint,
                  forward parity against the sifigan package
  ckpt_contentvec modules/contentvec.convert_hf_hubert vs the released
                  lengyue233/content-vec-best state dict, forward parity
                  against transformers.HubertModel (transformers IS in
                  this image — only the artifact is missing)
  ckpt_transcriber modules/phoneme_midi converter vs the released
                  pretrained_model.pt, forward parity against torch

Thresholds are per-check and documented inline: exact-algorithm pairs
(mel, loudness, converters) use tight absolute bounds; reimplemented
estimators (harvest, cheaptrick, d4c) use the perceptual bounds the
in-repo analytic tests enforce (cents error / VUV agreement / dB
envelope error), since bit-equality with pyworld was never the goal.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # goldens are host libraries
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# runnable as `python scripts/golden_parity.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000
FFT, HOP, WIN = 512, 240, 480
FMIN, FMAX, NMELS = 63, 12000, 80


def _test_wav(path=None, seconds=3.0, seed=11):
    """A voiced test signal: gliding sawtooth-ish harmonic stack + breath
    noise (covers F0 tracking, spectral envelope, and silence head/tail)."""
    if path:
        from serenade_tpu.utils.audio import read_wav

        wav, fs = read_wav(path)
        if fs != SR:
            raise SystemExit(f"--wav must be {SR} Hz (got {fs})")
        return wav.astype(np.float64)
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    t = np.arange(n) / SR
    f0 = 180.0 * 2.0 ** (0.4 * np.sin(2 * np.pi * 0.7 * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 13))
    wav *= 0.25
    wav += 0.003 * rng.normal(size=n)
    # silent head/tail so VUV decisions are exercised
    wav[: SR // 4] = 0.0
    wav[-SR // 4:] = 0.0
    return wav


def _result(status, **kw):
    return dict(status=status, **kw)


def check_mel(wav):
    try:
        import librosa
    except ImportError:
        return _result("skipped", reason="librosa not installed")
    from serenade_tpu.ops.mel import logmelfilterbank

    golden_stft = np.abs(librosa.stft(
        wav.astype(np.float32), n_fft=FFT, hop_length=HOP, win_length=WIN,
        window="hann", pad_mode="reflect")).T
    mel_basis = librosa.filters.mel(sr=SR, n_fft=FFT, n_mels=NMELS,
                                    fmin=FMIN, fmax=FMAX)
    golden = np.log10(np.maximum(1e-10, golden_stft @ mel_basis.T))

    ours = np.asarray(logmelfilterbank(
        wav.astype(np.float32), SR, fft_size=FFT, hop_size=HOP,
        win_length=WIN, num_mels=NMELS, fmin=FMIN, fmax=FMAX,
        eps=1e-10, log_base=10.0))
    n = min(len(golden), len(ours))
    err = float(np.max(np.abs(golden[:n] - ours[:n])))
    # identical algorithm; bound = f32 STFT noise through the log
    return _result("pass" if err < 1e-3 else "fail", max_abs_err=err,
                   bound=1e-3, frames=n)


def check_loudness(wav):
    try:
        import librosa
    except ImportError:
        return _result("skipped", reason="librosa not installed")
    from serenade_tpu.ops.mel import loudness_extract

    stft = librosa.stft(wav.astype(np.float32), hop_length=HOP)
    power = np.square(np.abs(stft))
    bins = librosa.fft_frequencies(sr=SR)
    gold = np.log(np.mean(librosa.db_to_amplitude(
        librosa.perceptual_weighting(power, bins)), axis=0) + 1e-5)
    ours = np.asarray(loudness_extract(wav.astype(np.float32), SR, HOP))
    n = min(len(gold), len(ours))
    err = float(np.max(np.abs(gold[:n] - ours[:n])))
    return _result("pass" if err < 1e-2 else "fail", max_abs_err=err,
                   bound=1e-2, frames=n)


def check_harvest(wav):
    try:
        import pyworld
    except ImportError:
        return _result("skipped", reason="pyworld not installed")
    from serenade_tpu.ops.harvest import harvest_f0

    gold, _ = pyworld.harvest(wav, fs=SR, f0_floor=80.0, f0_ceil=800.0,
                              frame_period=10.0)
    ours, _ = harvest_f0(wav.astype(np.float32), SR, f0_floor=80.0,
                         f0_ceil=800.0, frame_period_ms=10.0)
    ours = np.asarray(ours, np.float64)
    n = min(len(gold), len(ours))
    gold, ours = gold[:n], ours[:n]
    both = (gold > 0) & (ours > 0)
    vuv_agree = float(np.mean((gold > 0) == (ours > 0)))
    cents = (1200.0 * np.abs(np.log2(ours[both] / gold[both]))
             if both.any() else np.array([np.inf]))
    med_cents = float(np.median(cents))
    # reimplementation bound, matching tests/test_harvest.py's analytic
    # tolerances: 95% VUV agreement, median voiced error < 20 cents
    ok = vuv_agree >= 0.95 and med_cents < 20.0
    return _result("pass" if ok else "fail", vuv_agreement=vuv_agree,
                   median_cents=med_cents, bound="vuv>=0.95,cents<20")


def check_cheaptrick(wav):
    try:
        import pyworld
    except ImportError:
        return _result("skipped", reason="pyworld not installed")
    from serenade_tpu.ops.world import cheaptrick

    f0, tt = pyworld.harvest(wav, fs=SR, f0_floor=80.0, f0_ceil=800.0,
                             frame_period=10.0)
    gold = pyworld.cheaptrick(wav, f0, tt, SR)
    ours = np.asarray(cheaptrick(wav.astype(np.float64), f0, SR,
                                 frame_period_ms=10.0))
    n = min(gold.shape[0], ours.shape[0])
    voiced = f0[:n] > 0
    db = 10.0 * np.abs(np.log10(np.maximum(ours[:n][voiced], 1e-12))
                       - np.log10(np.maximum(gold[:n][voiced], 1e-12)))
    mean_db = float(np.mean(db)) if voiced.any() else float("inf")
    # envelope reimplementation: mean voiced deviation < 1.5 dB
    return _result("pass" if mean_db < 1.5 else "fail",
                   mean_voiced_db_err=mean_db, bound=1.5)


def check_d4c_bap(wav):
    try:
        import pyworld
    except ImportError:
        return _result("skipped", reason="pyworld not installed")
    from serenade_tpu.ops.world import band_aperiodicity

    f0, tt = pyworld.harvest(wav, fs=SR, f0_floor=80.0, f0_ceil=800.0,
                             frame_period=10.0)
    ap = pyworld.d4c(wav, f0, tt, SR)
    gold_bap = pyworld.code_aperiodicity(ap, SR)
    ours = np.asarray(band_aperiodicity(wav.astype(np.float64), f0, SR,
                                        frame_period_ms=10.0))
    n = min(gold_bap.shape[0], ours.shape[0])
    voiced = f0[:n] > 0
    if not voiced.any():
        return _result("fail", reason="no voiced frames")
    err = float(np.mean(np.abs(ours[:n][voiced] - gold_bap[:n][voiced])))
    # coded band aperiodicity is in dB; mean voiced deviation < 3 dB
    return _result("pass" if err < 3.0 else "fail",
                   mean_voiced_db_err=err, bound=3.0)


def _need(path, what):
    if not path:
        return _result("skipped", reason=f"no --{what} given")
    if not os.path.exists(path):
        return _result("skipped", reason=f"{path} does not exist")
    return None


def check_ckpt_serenade(path):
    gate = _need(path, "serenade-ckpt")
    if gate:
        return gate
    try:
        import torch  # noqa: F401
        from serenade.models import Serenade as TorchSerenade  # reference pkg
    except ImportError as e:
        return _result("skipped", reason=f"reference package absent: {e}")
    import jax

    from serenade_tpu.models import Serenade
    from serenade_tpu.models.convert_serenade import (
        convert_serenade, load_torch_serenade_checkpoint)

    sd = load_torch_serenade_checkpoint(path)
    variables = convert_serenade(sd)
    model = Serenade(input_dim=768, output_dim=80, encoder_channels=80,
                     decoder_channels=512, gst_embed_dim=256,
                     decoder_attention_head_dim=512)
    rng = np.random.default_rng(0)
    b, t = 1, 128
    x = rng.normal(size=(b, t, 768)).astype(np.float32)
    logmel = rng.normal(size=(b, t, 80)).astype(np.float32)
    midi = rng.uniform(size=(b, t, 1)).astype(np.float32)
    loud = rng.uniform(size=(b, t, 1)).astype(np.float32)
    out = model.apply(variables, jax.numpy.asarray(x),
                      jax.numpy.asarray([t]), jax.numpy.asarray(logmel),
                      jax.numpy.asarray(midi), jax.numpy.asarray(loud),
                      rng=jax.random.key(0), n_timesteps=4,
                      method="inference")
    import torch

    tm = TorchSerenade()  # released hyperparameters
    tm.load_state_dict(sd)
    tm.eval()
    with torch.no_grad():
        ref = tm.inference(
            torch.from_numpy(x), torch.tensor([t]),
            torch.from_numpy(logmel), torch.from_numpy(midi),
            torch.from_numpy(loud), n_timesteps=4)
    err = float(np.max(np.abs(np.asarray(out) - ref.numpy())))
    # CFM sampling uses framework-specific noise; compare envelopes
    return _result("pass" if err < 1.0 else "fail", max_abs_err=err,
                   bound=1.0,
                   note="stochastic sampler: envelope-level bound")


def check_ckpt_hifigan(path, config):
    gate = _need(path, "hifigan-ckpt")
    if gate:
        return gate
    try:
        import torch
        from parallel_wavegan.utils import load_model as pwg_load
    except ImportError as e:
        return _result("skipped", reason=f"parallel_wavegan absent: {e}")
    import yaml

    from serenade_tpu.vocoder.vocoder import Vocoder, load_vocoder

    with open(config) as f:
        cfg = yaml.safe_load(f)
    gen, params = load_vocoder(path, cfg)
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, 64, cfg.get("num_mels", 80))).astype(
        np.float32)
    ours = np.asarray(gen.apply(params, mel))[0]
    tm = pwg_load(path, cfg).eval().to("cpu")
    tm.remove_weight_norm()
    with torch.no_grad():
        ref = tm.inference(torch.from_numpy(mel[0])).numpy()
    n = min(len(ours.reshape(-1)), len(ref.reshape(-1)))
    err = float(np.max(np.abs(ours.reshape(-1)[:n] - ref.reshape(-1)[:n])))
    return _result("pass" if err < 1e-3 else "fail", max_abs_err=err,
                   bound=1e-3)


def check_ckpt_sifigan(path):
    gate = _need(path, "sifigan-ckpt")
    if gate:
        return gate
    try:
        import torch
        from sifigan.models import SiFiGANGenerator as TorchSiFiGAN
    except ImportError as e:
        return _result("skipped", reason=f"sifigan package absent: {e}")
    import jax

    from serenade_tpu.sifigan import SiFiGANGenerator
    from serenade_tpu.sifigan.convert import load_sifigan_checkpoint

    model = SiFiGANGenerator()
    params = load_sifigan_checkpoint(path, model)
    rng = np.random.default_rng(2)
    c = rng.normal(size=(1, 40, 64)).astype(np.float32)
    f0 = np.full((1, 64, 1), 200.0, np.float32)
    ours = np.asarray(model.apply(
        params, jax.numpy.asarray(c), jax.numpy.asarray(f0)))
    tm = TorchSiFiGAN(in_channels=40)
    tm.load_state_dict(torch.load(path, map_location="cpu",
                                  weights_only=False)["model"]["generator"])
    tm.eval()
    tm.remove_weight_norm()
    with torch.no_grad():
        dfs = tm.dense_factors if hasattr(tm, "dense_factors") else None
        ref = tm(torch.from_numpy(c),
                 *( [torch.from_numpy(f0.transpose(0, 2, 1))] if dfs is None
                    else [] ))[0].numpy()
    n = min(ours.size, ref.size)
    err = float(np.max(np.abs(ours.reshape(-1)[:n] - ref.reshape(-1)[:n])))
    return _result("pass" if err < 1e-3 else "fail", max_abs_err=err,
                   bound=1e-3)


def check_ckpt_contentvec(path):
    gate = _need(path, "contentvec-ckpt")
    if gate:
        return gate
    try:
        import torch
        import transformers
    except ImportError as e:  # transformers IS in this image
        return _result("skipped", reason=f"{e}")
    import jax

    from serenade_tpu.modules.contentvec import (
        ContentVecEncoder, convert_hf_hubert)

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = convert_hf_hubert(sd)
    model = ContentVecEncoder()
    rng = np.random.default_rng(3)
    wav16 = rng.normal(size=(1, 16000)).astype(np.float32) * 0.1
    ours = np.asarray(model.apply(params, jax.numpy.asarray(wav16)))

    config = transformers.HubertConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, classifier_proj_size=256,
        apply_spec_augment=False)

    class HubertModelWithFinalProj(transformers.HubertModel):
        def __init__(self, config):
            super().__init__(config)
            self.final_proj = torch.nn.Linear(
                config.hidden_size, config.classifier_proj_size)

    tm = HubertModelWithFinalProj(config)
    tm.load_state_dict(sd)
    tm.eval()
    # the reference's 20ms -> 10ms stride hack (ref preprocess.py:361-368),
    # which ContentVecEncoder bakes in as last_conv_stride=1
    tm.feature_extractor.conv_layers[-1].conv.stride = (1,)
    with torch.no_grad():
        ref = tm(torch.from_numpy(wav16))["last_hidden_state"].numpy()
    n = min(ours.shape[1], ref.shape[1])
    a, b = ours[:, :n], ref[:, :n]
    err = float(np.max(np.abs(a - b)))
    rel = err / (float(np.std(b)) + 1e-9)
    corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    # 12 transformer layers of f32 accumulation divergence (oneDNN vs
    # XLA); the in-repo twin test bounds this at atol 1.5e-2 on O(1)
    # activations + corr>0.99999 (tests/test_contentvec.py) — use the
    # scale-relative form so any activation magnitude is handled
    ok = rel < 0.05 and corr > 0.9999
    return _result("pass" if ok else "fail", max_abs_err=err,
                   rel_err_vs_std=rel, corr=corr,
                   bound="rel<0.05,corr>0.9999")


def check_ckpt_transcriber(path):
    gate = _need(path, "transcriber-ckpt")
    if gate:
        return gate
    try:
        import torch  # noqa: F401
    except ImportError as e:
        return _result("skipped", reason=f"{e}")
    from serenade_tpu.modules.phoneme_midi import load_transcriber

    try:
        transcribe_fn = load_transcriber(path)
    except Exception as e:
        return _result("fail", reason=f"converter raised: {e}")
    notes, intervals = transcribe_fn(_test_wav(seconds=2.0), SR)
    ok = (len(notes) == len(intervals)
          and all(0 <= n < 128 for n in notes)
          and all(e > s for s, e in intervals))
    return _result("pass" if ok else "fail", n_notes=len(notes),
                   note="released ckpt converted + decoded end-to-end; "
                        "twin parity is tests/test_phoneme_midi.py")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", default=None,
                   help=f"optional real {SR} Hz wav for the feature checks")
    p.add_argument("--serenade-ckpt", default=None)
    p.add_argument("--hifigan-ckpt", default=None)
    p.add_argument("--hifigan-config", default=None)
    p.add_argument("--sifigan-ckpt", default=None)
    p.add_argument("--contentvec-ckpt", default=None)
    p.add_argument("--transcriber-ckpt", default=None)
    args = p.parse_args()

    wav = _test_wav(args.wav)
    checks = {
        "mel": lambda: check_mel(wav),
        "loudness": lambda: check_loudness(wav),
        "f0_harvest": lambda: check_harvest(wav),
        "cheaptrick": lambda: check_cheaptrick(wav),
        "d4c_bap": lambda: check_d4c_bap(wav),
        "ckpt_serenade": lambda: check_ckpt_serenade(args.serenade_ckpt),
        "ckpt_hifigan": lambda: check_ckpt_hifigan(
            args.hifigan_ckpt, args.hifigan_config),
        "ckpt_sifigan": lambda: check_ckpt_sifigan(args.sifigan_ckpt),
        "ckpt_contentvec": lambda: check_ckpt_contentvec(
            args.contentvec_ckpt),
        "ckpt_transcriber": lambda: check_ckpt_transcriber(
            args.transcriber_ckpt),
    }
    results = {}
    for name, fn in checks.items():
        try:
            results[name] = fn()
        except Exception as e:  # a crash is a failure, not a skip
            results[name] = _result("fail",
                                    reason=f"{type(e).__name__}: {e}")
    n_pass = sum(r["status"] == "pass" for r in results.values())
    n_fail = sum(r["status"] == "fail" for r in results.values())
    n_skip = sum(r["status"] == "skipped" for r in results.values())
    verdict = {
        "golden_parity": results,
        "summary": {"pass": n_pass, "fail": n_fail, "skipped": n_skip,
                    "ok": n_fail == 0},
    }
    print(json.dumps(verdict))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
