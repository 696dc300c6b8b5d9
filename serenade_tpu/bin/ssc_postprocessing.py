"""serenade-postprocessing: WORLD re-analysis + SiFiGAN re-synthesis.

Counterpart of reference bin/ssc_postprocessing.py:75-241 (hydra CLI):
for every converted wav, re-analyze with the WORLD-class ops (F0 via
Harvest with voice-type ranges — the reference's analyzer,
ssc_postprocessing.py:147-153; ``--f0-backend yin`` keeps the faster
YIN-Viterbi — CheapTrick envelope, D4C aperiodicity), read the
`lf0` target written by decode, mel-cepstrum-code the envelope
(sp2mc), build continuous F0 + sine excitation + dense dilation factors,
and synthesize `*_sifigan.wav` with the SiFiGAN generator.

Config: a plain YAML with the reference's hydra key surface
(bin/sifigan_config/ssc_postprocessing.yaml — sample_rate, frame_period,
mcep_dim, aux_feats, dense_factors, sine params, generator params).
argparse replaces hydra; `--config` + `key=value` overrides.

``--anasyn [--f0-factors 0.5,1.0,2.0]`` runs the vendored
analysis-synthesis flow instead (reference
bin/sifigan_config/anasyn.yaml + decode.yaml ``f0_factors``): condition
on each wav's OWN analyzed F0, pitch-scaled per factor — SiFiGAN's F0
control without the SSC decode step.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os

import numpy as np
import yaml

from serenade_tpu.utils.audio import read_wav, resample, to_mono, write_wav
from serenade_tpu.utils.h5 import read_hdf5

logger = logging.getLogger(__name__)

# voice-type F0 ranges (reference ssc_postprocessing.py:121-137)
VOICE_RANGES = {
    "Soprano": (261, 1046),
    "Alto": (196, 700),
    "Tenor": (130, 440),
    "Bass": (82, 330),
}
DEFAULT_RANGE = (80, 1100)

DEFAULT_CONFIG = dict(
    sample_rate=24000,
    frame_period=5.0,
    mcep_dim=39,
    mcap_dim=19,
    aux_feats=["mcep", "bap"],
    dense_factors=[0.5, 1, 4, 8],
    df_f0_type="cf0",
    sine_amp=0.1,
    noise_amp=0.003,
    sine_f0_type="cf0",
    signal_types=["sine"],
    seed=100,
    generator=dict(
        in_channels=43,
        out_channels=1,
        channels=512,
        kernel_size=7,
        upsample_scales=[5, 4, 3, 2],
        upsample_kernel_sizes=[10, 8, 6, 4],
    ),
)


def convert_continuous_f0(f0: np.ndarray):
    """Linear interpolation through unvoiced gaps with edge extension
    (reference ssc_postprocessing.py:51-72). Returns (uv, cont_f0, ok)."""
    f0 = np.asarray(f0, np.float64).reshape(-1)
    uv = (f0 != 0).astype(np.float32)
    if (f0 == 0).all():
        logger.warning("all F0 values are zero")
        return uv, f0, False
    nz = np.nonzero(f0)[0]
    cont = f0.copy()
    cont[: nz[0]] = f0[nz[0]]
    cont[nz[-1]:] = f0[nz[-1]]
    nz2 = np.nonzero(cont)[0]
    cont = np.interp(np.arange(len(cont)), nz2, cont[nz2])
    return uv, cont, True


def voice_range_for(path: str):
    for name, rng in VOICE_RANGES.items():
        if name in path:
            return rng
    logger.warning("unknown voice type for %s", path)
    return DEFAULT_RANGE


def main():
    p = argparse.ArgumentParser(description="SiFiGAN post-processing")
    p.add_argument("--config", default=None, help="yaml config")
    p.add_argument("--in-dir", required=True)
    p.add_argument("--stats", default=None,
                   help="joblib scaler for aux features (sifigan training "
                        "stats); identity normalization when absent")
    p.add_argument("--checkpoint-path", default=None,
                   help="SiFiGAN checkpoint: a released torch .pkl "
                        "(converted on the fly) or an orbax directory from "
                        "serenade-vocoder-train --vocoder-type sifigan; "
                        "random init when absent (smoke/testing only)")
    p.add_argument("--f0-backend", default="harvest",
                   choices=("harvest", "harvest_native", "yin"),
                   help="re-analysis F0 estimator; the reference runs WORLD "
                        "Harvest here (ssc_postprocessing.py:147-153), "
                        "'yin' keeps the faster YIN-Viterbi path")
    p.add_argument("--ap-backend", default="bandap",
                   choices=("bandap", "d4c"),
                   help="aperiodicity estimator: 'bandap' (autocorrelation, "
                        "calibrated to ~0.3 dB of true band noise ratios) or "
                        "'d4c' (WORLD's static-group-delay D4C, the "
                        "reference's pyworld.d4c algorithm — see "
                        "ops/world.py for the measured comparison)")
    p.add_argument("--analysis-backend", default="jax",
                   choices=("jax", "native"),
                   help="CheapTrick/bandap execution: 'jax' (jitted, one "
                        "bucket-padded dispatch) or 'native' (the C++ host "
                        "library — no accelerator dispatch, for CPU-only "
                        "hosts; requires --ap-backend bandap; "
                        "cross-validated in tests/test_native.py)")
    p.add_argument("--synth-batch-size", type=int, default=8,
                   help="max utterances per SiFiGAN dispatch; same-bucket "
                        "utterances batch together (pow2-padded, so at most "
                        "log2 program shapes per length bucket)")
    p.add_argument("--synth-frame-bucket", type=int, default=128,
                   help="pad synthesis inputs to this frame multiple so the "
                        "generator compiles once per bucket, not once per "
                        "utterance length; 0 = exact-length per-utterance "
                        "synthesis (one compile per distinct length). "
                        "Padding uses edge values (continued F0, repeated "
                        "last aux frame) and the output is cut at the true "
                        "length; deviation vs exact-length synthesis is "
                        "confined to the generator's receptive field at the "
                        "utterance tail (quantified in "
                        "tests/test_postprocessing.py)")
    p.add_argument("--anasyn", action="store_true",
                   help="analysis-synthesis mode (the vendored "
                        "sifigan_config/anasyn.yaml flow): condition on "
                        "each wav's OWN analyzed F0 instead of a decode-"
                        "written lf0 h5, optionally pitch-scaled by "
                        "--f0-factors; outputs *_anasyn[_fX.XX].wav")
    p.add_argument("--f0-factors", default=None,
                   help="comma list of F0 scaling factors for --anasyn "
                        "(anasyn.yaml f0_factors; default '1.0')")
    p.add_argument("--verbose", type=int, default=1)
    args = p.parse_args()
    if args.f0_factors and not args.anasyn:
        p.error("--f0-factors only applies with --anasyn (the SSC flow's "
                "target F0 comes from the decode-written lf0 h5)")
    if args.analysis_backend == "native" and args.ap_backend != "bandap":
        p.error("--analysis-backend native supports --ap-backend bandap "
                "only (there is no native D4C)")

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    config = dict(DEFAULT_CONFIG)
    if args.config:
        with open(args.config) as f:
            config.update(yaml.safe_load(f) or {})

    import jax
    import jax.numpy as jnp

    from serenade_tpu.ops.f0 import smooth_f0_median, yin_f0
    from serenade_tpu.ops.sptk import ALPHA, sp2mc
    from serenade_tpu.sifigan import (
        SiFiGANDirectGenerator, SiFiGANGenerator, SignalGenerator,
    )
    from serenade_tpu.sifigan.features import (
        dense_factors_per_level, world_mcep_bap,
    )

    sr = int(config["sample_rate"])
    fp = float(config["frame_period"])
    hop = int(sr * fp / 1000.0)

    gen_cfg = dict(config["generator"])
    target = str(gen_cfg.pop("_target_", ""))
    sn_cfg = dict(gen_cfg.get("source_network_params", {}))
    fn_cfg = dict(gen_cfg.get("filter_network_params", {}))
    # the vendored config's hydra _target_ selects the generator variant
    # (sifigan.direct.yaml → SiFiGANDirectGenerator, which has no
    # share_downsamples — the filter downsamples embed the excitation)
    direct = target.endswith("SiFiGANDirectGenerator")
    gen_cls = SiFiGANDirectGenerator if direct else SiFiGANGenerator
    share_down = ({} if direct else
                  {"share_downsamples": gen_cfg.get("share_downsamples",
                                                    False)})
    model = gen_cls(
        **share_down,
        in_channels=gen_cfg.get("in_channels", 43),
        out_channels=gen_cfg.get("out_channels", 1),
        channels=gen_cfg.get("channels", 512),
        kernel_size=gen_cfg.get("kernel_size", 7),
        upsample_scales=tuple(gen_cfg.get("upsample_scales", (5, 4, 3, 2))),
        upsample_kernel_sizes=tuple(
            gen_cfg.get("upsample_kernel_sizes", (10, 8, 6, 4))
        ),
        source_resblock_kernel_size=sn_cfg.get("resblock_kernel_size", 3),
        source_resblock_dilations=tuple(
            tuple(d) for d in sn_cfg.get(
                "resblock_dilations",
                ((1,), (1, 2), (1, 2, 4), (1, 2, 4, 8)))),
        source_use_additional_convs=sn_cfg.get("use_additional_convs", True),
        filter_resblock_kernel_sizes=tuple(
            fn_cfg.get("resblock_kernel_sizes", (3, 5, 7))),
        filter_resblock_dilations=tuple(
            tuple(d) for d in fn_cfg.get(
                "resblock_dilations", ((1, 3, 5),) * 3)),
        filter_use_additional_convs=fn_cfg.get("use_additional_convs", False),
        share_upsamples=gen_cfg.get("share_upsamples", False),
    )
    params = None
    if args.checkpoint_path and os.path.exists(args.checkpoint_path):
        if os.path.isdir(args.checkpoint_path):
            # orbax checkpoint from serenade-vocoder-train --vocoder-type
            # sifigan
            from serenade_tpu.checkpoint import restore_generator_params

            params = restore_generator_params(args.checkpoint_path)
            logger.info("loaded in-framework SiFiGAN checkpoint %s",
                        args.checkpoint_path)
            if args.stats:
                logger.warning(
                    "--stats given with an in-framework checkpoint: the "
                    "trainer conditions on RAW mcep/bap (no scaler); a "
                    "released-model scaler here will mis-scale the aux "
                    "features — drop --stats unless you trained with the "
                    "same normalization"
                )
        else:  # released torch pickle: convert on the fly
            from serenade_tpu.sifigan.convert import load_sifigan_checkpoint

            params = load_sifigan_checkpoint(args.checkpoint_path, model)

    scaler = None
    if args.stats and os.path.exists(args.stats):
        import joblib

        scaler = joblib.load(args.stats)

    signal_gen = SignalGenerator(
        sample_rate=sr, hop_size=hop, sine_amp=config["sine_amp"],
        noise_amp=config["noise_amp"], signal_types=config["signal_types"],
        seed=config["seed"],
    )

    # filter on the FILE name only: a parent directory containing one of
    # these markers (e.g. an experiment dir named *_gt*) must not skip
    # every wav under it
    wav_paths = [
        w for w in glob.glob(os.path.join(args.in_dir, "**", "*.wav"),
                             recursive=True)
        if not any(m in os.path.basename(w) for m in
                   ("_reference", "_gt", "_sifigan", "_anasyn"))
    ]
    logger.info("processing %d wavs from %s", len(wav_paths), args.in_dir)
    f0_factors = [float(s) for s in
                  (args.f0_factors or "1.0").split(",")] if args.anasyn \
        else [1.0]

    # Phase 1: per-utterance analysis (each step one bucket-padded jitted
    # dispatch).  Synthesis inputs are collected so phase 2 can batch
    # same-bucket utterances into one generator dispatch — the reference
    # loops the GPU per utterance (ssc_postprocessing.py:225-237); on TPU
    # a fresh program per distinct length would dominate wall time.
    pending = []
    for wav_file in wav_paths:
        logger.info("processing %s", wav_file)
        f0_floor, f0_ceil = voice_range_for(wav_file)
        x, in_sr = read_wav(wav_file)
        x = to_mono(x)
        if in_sr != sr:
            x = resample(x, in_sr, sr)

        lf0 = None
        if not args.anasyn:
            h5_path = wav_file.replace(".wav", ".h5")
            lf0 = read_hdf5(h5_path, "lf0")
            if lf0 is None:
                logger.warning("no lf0 h5 beside %s; skipping", wav_file)
                continue
            lf0 = np.asarray(lf0).reshape(-1)

        # re-analysis F0 (bucket-padded so the jitted estimators compile
        # once per length bucket, not once per utterance)
        from serenade_tpu.features import _bucketed

        x_b, n_frames = _bucketed(np.asarray(x, np.float32), hop)
        if args.f0_backend == "harvest_native":
            from serenade_tpu.native import harvest_f0_native

            f0_cvt = harvest_f0_native(
                x, fs=sr, f0_floor=float(f0_floor), f0_ceil=float(f0_ceil),
                frame_period_ms=fp)[0]
        elif args.f0_backend == "harvest":
            from serenade_tpu.ops.harvest import harvest_f0

            f0_cvt = harvest_f0(
                jnp.asarray(x_b), fs=sr, f0_floor=float(f0_floor),
                f0_ceil=float(f0_ceil), frame_period_ms=fp)[0]
        else:
            f0_cvt, _ = yin_f0(jnp.asarray(x_b), fs=sr,
                               f0_floor=float(f0_floor),
                               f0_ceil=float(f0_ceil), frame_period_ms=fp)
        f0_cvt = np.asarray(smooth_f0_median(jnp.asarray(f0_cvt)))[:n_frames]
        T = len(f0_cvt)
        if args.anasyn:
            # analysis-synthesis: the utterance's own F0 is the target
            lf0 = np.asarray(f0_cvt, np.float64)
        elif len(lf0) != T:
            grid = np.linspace(0, len(lf0) - 1, T)
            lf0 = np.maximum(np.interp(grid, np.arange(len(lf0)), lf0), 0.0)

        mcep, bap, sp = world_mcep_bap(
            x, lf0.astype(np.float32), sr, fp, int(config["mcep_dim"]),
            ap_backend=args.ap_backend,
            analysis_backend=args.analysis_backend,
        )

        uv, cf0, ok = convert_continuous_f0(lf0)
        if not ok:
            continue

        feats = {
            "f0": lf0[:, None], "cf0": cf0[:, None], "uv": uv[:, None],
            "mcep": mcep, "bap": bap,
        }
        if "mcap" in config["aux_feats"]:
            # mel-cepstral aperiodicity (reference ssc_postprocessing.py:170)
            from serenade_tpu.ops.world import aperiodicity_spectrum

            ap_full = aperiodicity_spectrum(bap, sr, (sp.shape[1] - 1) * 2)
            feats["mcap"] = sp2mc(np.maximum(ap_full, 1e-10),
                                  order=int(config["mcap_dim"]),
                                  alpha=ALPHA[sr])
        cols = []
        for name in config["aux_feats"]:
            v = feats[name]
            if scaler is not None and name in scaler:
                v = scaler[name].transform(v)
            cols.append(v)
        c = np.concatenate(cols, axis=1).astype(np.float32)

        df_f0 = cf0 if config["df_f0_type"] == "cf0" else lf0
        sine_f0 = cf0 if config["sine_f0_type"] == "cf0" else lf0
        for fac in f0_factors:
            # F0 scaling (anasyn.yaml f0_factors): aux spectral features
            # stay, the excitation F0 streams scale — SiFiGAN's pitch
            # control.  fac == 1.0 in the standard SSC flow.
            if args.anasyn:
                suffix = ("_anasyn.wav" if fac == 1.0
                          else f"_anasyn_f{fac:.2f}.wav")
            else:
                suffix = "_sifigan.wav"
            pending.append(dict(
                wav_file=wav_file, c=c,
                out_path=wav_file.replace(".wav", suffix),
                df_f0=np.asarray(df_f0, np.float64) * fac,
                sine_f0=np.asarray(sine_f0, np.float64) * fac,
                n_frames=len(lf0)))

    # Phase 2: bucket-padded, pow2-batched synthesis.
    from serenade_tpu.collaters.ssc import pad_pow2

    bucket = max(int(args.synth_frame_bucket), 0)
    max_batch = max(int(args.synth_batch_size), 1) if bucket else 1

    def padded_frames(t: int) -> int:
        if bucket == 0:
            return t
        return max(((t + bucket - 1) // bucket) * bucket, bucket)

    groups: dict = {}
    for item in pending:
        groups.setdefault(padded_frames(item["n_frames"]),
                          []).append(item)

    infer = None
    for t_b in sorted(groups):
        items = groups[t_b]
        for lo in range(0, len(items), max_batch):
            real = items[lo:lo + max_batch]
            chunk = pad_pow2(real)
            cs, sines, dfs_rows = [], [], []
            for it in chunk:
                t = it["n_frames"]
                pad = t_b - t
                # edge padding: continued F0 keeps the sine excitation
                # phase-continuous into the (discarded) padded region;
                # repeating the last aux frame avoids a zero-energy cliff
                # bleeding back through the conv receptive field.
                cs.append(np.pad(it["c"], ((0, pad), (0, 0)), mode="edge"))
                sine_f0 = np.pad(it["sine_f0"], (0, pad), mode="edge")
                df_f0 = np.pad(it["df_f0"], (0, pad), mode="edge")
                sines.append(signal_gen(sine_f0))
                dfs_rows.append(dense_factors_per_level(
                    df_f0, sr, config["dense_factors"],
                    model.upsample_scales))
            c_j = jnp.asarray(np.stack(cs))
            sine_j = jnp.asarray(np.stack(sines))
            dfs_j = [jnp.asarray(np.stack([r[i] for r in dfs_rows]))
                     for i in range(len(dfs_rows[0]))]
            if params is None:
                params = model.init(jax.random.key(0), sine_j, c_j, dfs_j)
                logger.warning(
                    "using RANDOM SiFiGAN weights (no checkpoint)")
            if infer is None:
                infer = jax.jit(
                    lambda p, s, c, d: model.apply(p, s, c, d)[0])
            y = np.asarray(jax.device_get(
                infer(params, sine_j, c_j, dfs_j)))
            for row, it in zip(y, real):
                write_wav(it["out_path"], row[: it["n_frames"] * hop, 0], sr)
                logger.info("wrote %s", it["out_path"])


if __name__ == "__main__":
    main()
