"""serenade-decode: singing style conversion inference CLI.

Counterpart of reference bin/ssc_decode.py:190-459: loads config beside the
checkpoint, the fitted scaler, the vocoder, and the model; for every source
utterance and every reference style it normalizes features, transposes the
source F0 with `linear_midi_shift` (written to h5 for the SiFiGAN
post-processing stage), runs the infilling inference, vocodes, and writes
wavs.

TPU-native notes: features are bucket-padded so every (source-bucket,
ref-bucket) pair reuses one compiled program; inference itself is the
jitted packed-sequence CFM (models/serenade.py docstring), which also
removes the reference's batch=1 restriction.  The ≤2-shard reference-lookup
assumption of the reference (ssc_decode.py:169-181) is replaced by a glob
across all ``dump.*`` sibling shards.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import time

import numpy as np

from serenade_tpu.collaters.ssc import bucket_length, pad_to
from serenade_tpu.config import load_config, resolve
from serenade_tpu.ops.f0_stats import linear_midi_shift
from serenade_tpu.utils.audio import write_wav
from serenade_tpu.utils.h5 import read_hdf5, write_hdf5

STYLES = ("Breathy", "Falsetto", "Pharyngeal", "Mixed_Voice")
VARIANT_NEW = False


def build_argparser():
    p = argparse.ArgumentParser(description="decode with trained SSC model")
    p.add_argument("--config", default=None)
    p.add_argument("--feats-scp", "--scp", default=None)
    p.add_argument("--dumpdir", default=None)
    p.add_argument("--stats", required=True)
    p.add_argument("--ref-dict", default=None,
                   help="json mapping style name -> reference dump h5")
    p.add_argument("--outdir", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--average-n", type=int, default=1,
                   help="average the last N orbax checkpoints in the "
                        "checkpoint's directory before decoding "
                        "(smooths the optimization endpoint)")
    p.add_argument("--batch-size", type=int, default=1,
                   help="batch conversions with matching length buckets "
                        "(>1 exploits the packed-sequence batched inference "
                        "the reference cannot do, serenade.py:208-210)")
    p.add_argument("--n-timesteps", type=int, default=None,
                   help="CFM ODE steps (default: the checkpoint config's "
                        "inference_n_timesteps — 2 for serenade-distill "
                        "checkpoints — else 10, the reference sampler)")
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--solver", default=None,
                   choices=("euler", "midpoint", "ab2"),
                   help="CFM ODE solver (euler = reference parity). "
                        "Measured against the converged flow on a trained "
                        "field (tests/test_cfm_solvers.py::"
                        "test_solver_quality_on_trained_field): "
                        "'ab2 --n-timesteps 7' BEATS euler-10 in MCD "
                        "(0.23 vs 0.32 dB) at 70%% of its cost, ab2-6 "
                        "matches it at 60%%, ab2-5 trades +0.2 dB for "
                        "half cost")
    p.add_argument("--data-axis", type=int, default=1,
                   help="shard each decode batch over an N-way 'data' "
                        "device mesh (params replicated) — full-corpus "
                        "decode on a pod slice; combine with --batch-size")
    p.add_argument("--num-shards", type=int, default=1,
                   help="partition the utterance list for array-job decode"
                        " (reference n_jobs sharding)")
    p.add_argument("--shard", type=int, default=1,
                   help="1-based shard index (JOB)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", type=int, default=1)
    return p


def get_random_ref_style(dumpdir: str, utt_id: str):
    """Pick one reference dump per style for this singer (reference
    ssc_decode.py:157-187), searching every sibling `dump.*` shard."""
    dirname = os.path.dirname(os.path.join(dumpdir, f"{utt_id}.h5"))
    ln, spk = utt_id.split("_")[:2]
    search_dirs = [dirname]
    parent = os.path.dirname(dirname.rstrip("/"))
    base = os.path.basename(dirname.rstrip("/"))
    if "." in base:
        stem = base.split(".")[0]
        search_dirs = sorted(glob.glob(os.path.join(parent, f"{stem}.*")))
    ref_dict = {}
    for style in STYLES:
        for d in search_dirs:
            files = glob.glob(os.path.join(d, f"{ln}_{spk}_*_{style}_Group_*.h5"))
            if files:
                ref_dict[style] = np.random.choice(files)
                break
    logging.info("using reference styles: %s", ref_dict)
    return ref_dict


def _norm_ref(scaler, h5path, with_fluc=False):
    ref = {
        "hubert": read_hdf5(h5path, "hubert"),
        "logmel": read_hdf5(h5path, "logmel"),
        "loud": read_hdf5(h5path, "loud"),
        "score": read_hdf5(h5path, "est_lf0_score"),
        "f0": read_hdf5(h5path, "f0"),
        "wave": read_hdf5(h5path, "wave"),
    }
    ref["hubert"] = (ref["hubert"] - scaler["hubert"].mean_) / scaler["hubert"].scale_
    ref["logmel"] = (ref["logmel"] - scaler["logmel"].mean_) / scaler["logmel"].scale_
    ref["score"] = (ref["score"] - scaler["score"].data_min_) / (
        scaler["score"].data_max_ - scaler["score"].data_min_
    )
    ref["loud"] = (ref["loud"] - scaler["loud"].data_min_) / (
        scaler["loud"].data_max_ - scaler["loud"].data_min_
    )
    if with_fluc:
        ref["f0_fluc"] = read_hdf5(h5path, "f0_fluc")
    return ref


def _pad2(x, T):
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    return pad_to(x, T)


def run(variant_new: bool):
    args = build_argparser().parse_args()
    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )
    import jax
    import jax.numpy as jnp
    import joblib

    import serenade_tpu.models  # noqa: F401 (register)
    from serenade_tpu.checkpoint import restore_params_only
    from serenade_tpu.datasets.feats_dataset import FeatsDataset, FeatsDatasetNew
    from serenade_tpu.vocoder import Vocoder

    if args.config is None:
        args.config = os.path.join(os.path.dirname(args.checkpoint), "config.yml")
    config = load_config(args.config)
    # a distilled checkpoint's config recommends its own sampler
    # (serenade-distill writes inference_n_timesteps/inference_solver);
    # explicit CLI flags always win
    if args.n_timesteps is None:
        args.n_timesteps = int(config.get("inference_n_timesteps", 10))
    if args.solver is None:
        args.solver = str(config.get("inference_solver", "euler"))
    config.update({k: v for k, v in vars(args).items() if v is not None})
    os.makedirs(args.outdir, exist_ok=True)

    if (args.feats_scp is None) == (args.dumpdir is None):
        raise ValueError("specify exactly one of --dumpdir / --feats-scp")

    scaler = joblib.load(args.stats)
    trg_stats = {"mean": scaler["logmel"].mean_, "scale": scaler["logmel"].scale_}
    vocoder = None
    voc_cfg = config.get("vocoder") or {}
    from serenade_tpu.vocoder.vocoder import vocoder_available

    if vocoder_available(voc_cfg):
        vocoder = Vocoder(voc_cfg.get("checkpoint") or "", voc_cfg["config"],
                          voc_cfg["stats"], trg_stats=trg_stats)
    else:
        logging.warning("no vocoder available; writing mel h5 instead of wavs")

    dataset_cls = FeatsDatasetNew if variant_new else FeatsDataset
    dataset = dataset_cls(
        root_dir=args.dumpdir, scaler=scaler, score_type="est_lf0_score",
        return_utt_id=True,
    )
    utt_indices = list(range(len(dataset)))
    if args.num_shards > 1:
        utt_indices = utt_indices[args.shard - 1::args.num_shards]
        logging.info("shard %d/%d: %d of %d utterances",
                     args.shard, args.num_shards, len(utt_indices),
                     len(dataset))
    logging.info("decoding %d utterances", len(utt_indices))

    model_cls = resolve("model", config["model_type"])
    model_params = dict(config.get("model_params", {}))
    if args.checkpoint.endswith(".pkl") and args.average_n > 1:
        raise SystemExit(
            "--average-n requires orbax checkpoints; a converted torch "
            ".pkl is a single snapshot"
        )
    if args.checkpoint.endswith(".pkl"):
        # reference torch checkpoint: convert on the fly; the GST must run
        # the checkpoint's BatchNorm running statistics exactly
        from serenade_tpu.models.convert_serenade import (
            convert_serenade, load_torch_serenade_checkpoint,
        )

        model_params["gst_norm_type"] = "frozen_batch"
        params = convert_serenade(
            load_torch_serenade_checkpoint(args.checkpoint)
        )
        logging.info("converted torch checkpoint %s", args.checkpoint)
    elif args.average_n > 1:
        from serenade_tpu.checkpoint import (
            average_checkpoints, checkpoint_step, find_last_checkpoints,
        )

        # anchor the window at the given checkpoint: average the N
        # checkpoints ENDING at its step, so pointing --checkpoint at an
        # older snapshot does not silently average the newest N instead
        anchor = checkpoint_step(args.checkpoint)
        if anchor is None:
            logging.warning(
                "--average-n: %s is not a step-named checkpoint; averaging "
                "the newest %d in its directory", args.checkpoint,
                args.average_n)
        paths = find_last_checkpoints(
            os.path.dirname(args.checkpoint), args.average_n,
            max_step=anchor)
        params = average_checkpoints(paths)
        logging.info("averaged %d checkpoints: %s", len(paths),
                     [os.path.basename(p) for p in paths])
    else:
        params = restore_params_only(args.checkpoint)
    model = model_cls(**model_params)

    # optional mesh data parallelism: params replicated, each batch
    # sharded on 'data' (the pod-slice full-corpus decode path)
    dp_mesh = None
    if args.data_axis > 1:
        from serenade_tpu.parallel import make_mesh, replicated

        dp_mesh = make_mesh(data=args.data_axis, model=1)
        params = jax.device_put(params, replicated(dp_mesh))
        logging.info("decode batches sharded over a %d-way data mesh",
                     args.data_axis)

    @jax.jit
    def infer(params, src, ref, key):
        kwargs = {}
        args_pos = [src["x"], src["lengths"], src["midi"], src["loud"]]
        if variant_new:
            args_pos.append(src["f0_fluc"])
        args_pos += [ref["x"], ref["lengths"], ref["logmel"], ref["midi"],
                     ref["loud"]]
        if variant_new:
            args_pos.append(ref["f0_fluc"])
        return model.apply(
            params, *args_pos, rng=key, n_timesteps=args.n_timesteps,
            temperature=args.temperature, solver=args.solver,
            method="inference", **kwargs,
        )

    ref_dict = None
    if args.ref_dict:
        with open(args.ref_dict) as f:
            ref_dict = json.load(f)

    # ------------------------------------------------------------------
    # collect conversion work items, grouped by (src-bucket, ref-bucket)
    # so each group shares one compiled program and can batch
    # ------------------------------------------------------------------
    from collections import defaultdict

    sr_out = int(config["sampling_rate"])
    ref_cache = {}
    groups = defaultdict(list)
    for idx in utt_indices:
        utt_id, item = dataset[idx]
        write_wav(os.path.join(args.outdir, f"{utt_id}_gt.wav"),
                  item["wave"], sr_out)
        utt_refs = ref_dict or get_random_ref_style(args.dumpdir, utt_id)
        for style, ref_h5 in utt_refs.items():
            if style in utt_id:
                continue  # avoid reconstruction (reference ssc_decode.py:381)
            if ref_h5 not in ref_cache:
                ref_cache[ref_h5] = _norm_ref(scaler, ref_h5,
                                              with_fluc=variant_new)
                # only shard 1 writes the shared reference wavs —
                # concurrent shards would race on the same path
                if args.shard == 1:
                    write_wav(
                        os.path.join(args.outdir,
                                     f"00_{style}_reference.wav"),
                        ref_cache[ref_h5]["wave"], sr_out,
                    )
            t_src = item["hubert"].shape[0]
            t_ref = ref_cache[ref_h5]["hubert"].shape[0]
            groups[(bucket_length(t_src), bucket_length(t_ref))].append(
                (utt_id, item, style, ref_h5)
            )

    def stack_src(items, Ts):
        out = {
            "x": jnp.asarray(np.stack(
                [_pad2(it["hubert"], Ts) for _, it, _, _ in items])),
            "lengths": jnp.asarray(
                [it["hubert"].shape[0] for _, it, _, _ in items]),
            "midi": jnp.asarray(np.stack(
                [_pad2(it["score"], Ts) for _, it, _, _ in items])),
            "loud": jnp.asarray(np.stack(
                [_pad2(it["loud"], Ts) for _, it, _, _ in items])),
        }
        if variant_new:
            out["f0_fluc"] = jnp.asarray(np.stack(
                [_pad2(it["f0_fluc"], Ts) for _, it, _, _ in items]))
        return out

    def stack_ref(items, Tr):
        refs = [ref_cache[h5] for _, _, _, h5 in items]
        out = {
            "x": jnp.asarray(np.stack([_pad2(r["hubert"], Tr) for r in refs])),
            "lengths": jnp.asarray([r["hubert"].shape[0] for r in refs]),
            "logmel": jnp.asarray(np.stack(
                [_pad2(r["logmel"], Tr) for r in refs])),
            "midi": jnp.asarray(np.stack(
                [_pad2(r["score"], Tr) for r in refs])),
            "loud": jnp.asarray(np.stack([_pad2(r["loud"], Tr) for r in refs])),
        }
        if variant_new:
            out["f0_fluc"] = jnp.asarray(np.stack(
                [_pad2(r["f0_fluc"], Tr) for r in refs]))
        return out

    key = jax.random.key(args.seed)
    bs = max(1, args.batch_size)
    for (Ts, Tr), work in groups.items():
        for chunk_start in range(0, len(work), bs):
            chunk = work[chunk_start:chunk_start + bs]
            true_n = len(chunk)
            if dp_mesh is not None:  # every mesh device needs a sub-batch
                pad_n = (-true_n) % args.data_axis
                chunk = chunk + [chunk[-1]] * pad_n
            src = stack_src(chunk, Ts)
            ref = stack_ref(chunk, Tr)
            if dp_mesh is not None:
                from serenade_tpu.parallel import shard_batch

                src = shard_batch(src, dp_mesh)
                ref = shard_batch(ref, dp_mesh)
            chunk = chunk[:true_n]
            key, sub = jax.random.split(key)
            start = time.time()
            mels = np.asarray(jax.device_get(infer(params, src, ref, sub)))
            for i, (utt_id, item, style, ref_h5) in enumerate(chunk):
                t_src = item["hubert"].shape[0]
                mel = mels[i, :t_src]
                shifted_lf0 = linear_midi_shift(
                    item["lf0"][:, 0], ref_cache[ref_h5]["f0"].reshape(-1)
                )
                outname = f"{utt_id}_{style}"
                write_hdf5(os.path.join(args.outdir, f"{outname}.h5"), "lf0",
                           shifted_lf0.astype(np.float32))
                if vocoder is not None:
                    wav, sr = vocoder.decode(mel)
                    write_wav(os.path.join(args.outdir, f"{outname}.wav"),
                              wav, sr)
                else:
                    write_hdf5(os.path.join(args.outdir, f"{outname}.h5"),
                               "mel", mel.astype(np.float32))
            elapsed = time.time() - start
            audio_sec = sum(
                it["hubert"].shape[0] for _, it, _, _ in chunk
            ) * float(config.get("shiftms", 10)) / 1000.0
            logging.info("batch of %d decoded (RTF %.4f)", len(chunk),
                         elapsed / max(audio_sec, 1e-6))


def main():
    run(variant_new=False)


if __name__ == "__main__":
    main()
