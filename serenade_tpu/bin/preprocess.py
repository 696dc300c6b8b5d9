"""serenade-preprocess: wav.scp -> per-utterance feature h5 dumps.

CLI counterpart of reference bin/preprocess.py:262-615 with the same flags
(--wav-scp/--segments/--dumpdir/--midi-path/--f0-path/--skip-gtmidi/
--config/--verbose) and the same on-disk contract (9 h5 keys per utt).

Offline-capable: ContentVec weights load from ``--contentvec-ckpt`` (a
torch HF HubertModel state dict converted on the fly); without it, pass
``--allow-missing-hubert true`` to dump everything except `hubert` (useful
for vocoder-only or analysis pipelines).  The audio-MIDI transcriber
checkpoint is optional; without it the estimated score comes from F0 note
segmentation (serenade_tpu/features.py docstring).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np
import yaml

from serenade_tpu.collaters.ssc import pad_pow2
from serenade_tpu.config import load_config
from serenade_tpu.datasets.audio_dataset import AudioSCPDataset
from serenade_tpu.features import FeatureConfig, extract_features_batch
from serenade_tpu.utils.h5 import write_hdf5
from serenade_tpu.utils.types import str2bool

WITH_F0_FLUC = False  # preprocess_new flips this


def build_argparser():
    p = argparse.ArgumentParser(description="extract SSC features")
    p.add_argument("--wav-scp", "--scp", required=True)
    p.add_argument("--segments", default=None)
    p.add_argument("--dumpdir", required=True)
    p.add_argument("--midi-path", default=None,
                   help="csv mapping utt_id -> wav path whose .json holds "
                        "the GT score (GTSinger layout)")
    p.add_argument("--f0-path", default=None, help="per-voice f0 range yaml")
    p.add_argument("--skip-gtmidi", type=str2bool, default=False)
    p.add_argument("--config", required=True)
    p.add_argument("--contentvec-ckpt", default=None,
                   help="torch HubertModel state-dict path (ContentVec)")
    p.add_argument("--midi-model-ckpt", default=None,
                   help="phoneme_midi transcriber checkpoint (optional)")
    p.add_argument("--allow-missing-hubert", type=str2bool, default=False)
    p.add_argument("--f0-backend",
                   choices=("viterbi", "harvest", "jax", "native",
                            "harvest_native"),
                   default="viterbi",
                   help="F0 estimator: YIN+Viterbi (default), Harvest-class "
                        "(the reference's algorithm, ops/harvest.py), plain "
                        "YIN, or the native C++ library on the host "
                        "(native=YIN, harvest_native=Harvest; CPU-only "
                        "preprocessing hosts)")
    p.add_argument("--batch-size", type=int, default=8,
                   help="vmap group size: same-bucket utterances from the "
                        "same singer share one mel+loudness+F0 dispatch")
    p.add_argument("--verbose", type=int, default=1)
    return p


def setup_logging(verbose: int):
    level = (logging.DEBUG if verbose > 1
             else logging.INFO if verbose > 0 else logging.WARN)
    logging.basicConfig(
        level=level,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )


def load_gt_note_map(midi_path):
    """The reference reads a 2-column csv `utt_id /wav_path` whose wav path
    with .json extension holds the note sequence (preprocess.py:371,449-457)."""
    mapping = {}
    if midi_path is None:
        return mapping
    if not os.path.exists(midi_path):
        logging.warning("midi map %s not found; GT score disabled", midi_path)
        return mapping
    with open(midi_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(" /", 1)
            if len(parts) != 2:
                continue
            mapping[parts[0]] = "/" + parts[1].replace(".wav", ".json")
    return mapping


def make_content_fn(ckpt_path, batch_size: int = 8):
    if ckpt_path is None:
        return None
    import jax
    import jax.numpy as jnp
    import torch

    from serenade_tpu.modules.contentvec import (
        ContentVecEncoder, convert_hf_hubert,
    )

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    model = ContentVecEncoder()
    # params must be jit ARGUMENTS, not closure captures: captured trees
    # bake ~380 MB of weight constants into the HLO, which bloats the
    # executable and overflows the remote-compile request body on
    # tunneled backends (HTTP 413)
    params = jax.device_put(convert_hf_hubert(sd))
    infer = jax.jit(lambda p, w: model.apply(p, w))

    def _bucket(audio16k):
        # bucket to 2 s multiples: one compile per bucket, not per length
        n = len(audio16k)
        bucket = 32000
        padded = ((n + bucket - 1) // bucket) * bucket
        wav = np.pad(np.asarray(audio16k, np.float32), (0, padded - n))
        n_frames = (n - 400) // 160 + 1  # conv stack receptive field
        return wav, max(n_frames, 1)

    def content_fn(audio16k):
        wav, n_frames = _bucket(audio16k)
        out = infer(params, jnp.asarray(wav)[None])
        return np.asarray(out[0])[:n_frames]

    def _run_grouped(prepped, run_infer):
        """The shared grouping policy: bucket-group, pow2-pad each window
        (bounds compiled-program count per bucket — serving shares this
        path with varying window sizes), one batched dispatch per run,
        slice each row to its true frame count.  Both the 16 kHz and the
        24 kHz wire paths go through here so the policy can't drift."""
        groups = {}
        for i, rec in enumerate(prepped):
            groups.setdefault(rec[0].shape[0], []).append(i)
        results = [None] * len(prepped)
        for idxs in groups.values():
            for lo in range(0, len(idxs), batch_size):
                chunk = idxs[lo:lo + batch_size]
                run = pad_pow2(chunk)
                out = run_infer(run)
                for j, i in enumerate(chunk):
                    results[i] = out[j][:prepped[i][1]]
        return results

    def batch(audios16k):
        """Same-bucket utterances share one HuBERT dispatch (identical
        per-utterance numerics: same padded shapes).

        Returns DEVICE arrays (lazy row slices): the serving dispatcher
        feeds them straight into the conversion pack, so the 768-d
        content features never round-trip host↔device (~3.6 MB per 6 s
        request on a slow link).  Host consumers (the preprocess CLI's
        h5 writer) pay the same download they always did, just at
        np.asarray time."""
        prepped = [_bucket(a) for a in audios16k]
        return _run_grouped(prepped, lambda run: infer(
            params, jnp.stack([jnp.asarray(prepped[i][0]) for i in run])))

    # --- 24 kHz wire path: resample to 16 kHz ON DEVICE --------------------
    # The host-resampled 16 kHz copy is a second waveform upload per
    # request; fusing scipy-parity polyphase resampling (ops/resample.py,
    # <=6e-7 vs resample_poly) into the HuBERT program removes it.
    from serenade_tpu.ops.resample import resample_device

    def _infer24(p, w24, n16):
        # zero past each row's true 16 kHz length: the host path pads the
        # resampled signal with exact zeros, while resampling the padded
        # 24 kHz signal leaves FIR ring-out in the tail — and the
        # transformer attends globally, so the tails must match
        y16 = resample_device(w24, 2, 3)
        mask = jnp.arange(y16.shape[-1])[None, :] < n16[:, None]
        return model.apply(p, jnp.where(mask, y16, 0.0))

    infer24 = jax.jit(_infer24)

    def _bucket24(audio24k, wire_dtype):
        # 48000-sample (2 s) buckets at 24 kHz map exactly onto the 16 kHz
        # path's 32000-sample buckets after the 2/3 resample
        n = len(audio24k)
        bucket = 48000
        padded = ((n + bucket - 1) // bucket) * bucket
        wav = np.pad(np.asarray(audio24k, np.float32), (0, padded - n))
        if wire_dtype == "int16":
            # /32768 convention: PCM16-sourced audio (read_wav) is lossless
            wav = np.clip(np.round(wav * 32768.0),
                          -32768, 32767).astype(np.int16)
        n16 = (n * 2 + 2) // 3  # ceil, = len(resample_poly(x, 2, 3))
        n_frames = (n16 - 400) // 160 + 1
        return wav, max(n_frames, 1), n16

    def batch24(audios24k, wire_dtype: str = "float32"):
        """`batch` from 24 kHz waveforms: dequantize (int16 wire),
        resample, and run HuBERT in ONE device program per group —
        numerics match host-resample + `batch` to f32 rounding."""
        prepped = [_bucket24(a, wire_dtype) for a in audios24k]
        return _run_grouped(prepped, lambda run: infer24(
            params,
            jnp.stack([jnp.asarray(prepped[i][0]) for i in run]),
            jnp.asarray([prepped[i][2] for i in run])))

    content_fn.batch = batch
    content_fn.batch24 = batch24
    return content_fn


def make_midi_transcribe_fn(ckpt_path):
    if ckpt_path is None:
        return None
    from serenade_tpu.modules.phoneme_midi import load_transcriber

    return load_transcriber(ckpt_path)


def run(args, with_f0_fluc: bool):
    setup_logging(args.verbose)
    config = load_config(args.config)
    fc = FeatureConfig.from_dict(config)

    dataset = AudioSCPDataset(args.wav_scp, segments=args.segments,
                              return_utt_id=True)
    os.makedirs(args.dumpdir, exist_ok=True)

    f0_table = None
    if args.f0_path:
        with open(args.f0_path) as f:
            f0_table = yaml.safe_load(f)

    gt_map = load_gt_note_map(args.midi_path)
    content_fn = make_content_fn(args.contentvec_ckpt)
    if content_fn is None and not args.allow_missing_hubert:
        logging.error(
            "no --contentvec-ckpt given; pass --allow-missing-hubert true to "
            "dump without content features"
        )
        sys.exit(1)
    midi_fn = make_midi_transcribe_fn(args.midi_model_ckpt)

    batch_size = max(int(getattr(args, "batch_size", 1) or 1), 1)
    n_done = 0

    def flush(pending):
        nonlocal n_done
        if not pending:
            return
        results = extract_features_batch(
            pending, fc,
            f0_table=f0_table,
            content_fn=content_fn,
            midi_transcribe_fn=midi_fn,
            with_f0_fluc=with_f0_fluc,
            f0_backend=args.f0_backend,
            max_group=batch_size,
        )
        for utt_id, _, _, _ in pending:
            feats = results.get(utt_id)
            if feats is None:
                continue
            out = os.path.join(args.dumpdir, f"{utt_id}.h5")
            for key, value in feats.items():
                write_hdf5(out, key, value)
            n_done += 1
            logging.info("dumped %s (%d frames)", utt_id,
                         feats["logmel"].shape[0])

    # accumulate a window of utterances so same-bucket/same-singer groups
    # share one device dispatch (window of 8 groups' worth)
    window = batch_size * 8
    pending = []
    for utt_id, (audio, fs) in dataset:
        gt_note_seq = None
        if not args.skip_gtmidi and utt_id in gt_map:
            path = gt_map[utt_id]
            if not os.path.exists(path):
                logging.info("WARNING: %s has missing midi information", utt_id)
                continue
            with open(path) as f:
                gt_note_seq = json.load(f)
        elif not args.skip_gtmidi and gt_map:
            logging.info("WARNING: %s not in midi map", utt_id)
            continue
        pending.append((utt_id, audio, fs, gt_note_seq))
        if len(pending) >= window:
            flush(pending)
            pending = []
    flush(pending)
    logging.info("preprocessing done: %d utterances", n_done)


def main():
    run(build_argparser().parse_args(), with_f0_fluc=WITH_F0_FLUC)


if __name__ == "__main__":
    main()
