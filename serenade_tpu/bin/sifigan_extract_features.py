#!/usr/bin/env python3
"""serenade-sifigan-extract-features: precompute SiFiGAN training streams.

Counterpart of the reference's sifigan extract_features surface
(/root/reference/serenade/bin/sifigan_config/extract_features.yaml: a
hydra config that WORLD-analyzes a wav.scp into hdf5 feature files for
vocoder training).  Here the same analysis — YIN F0 + median smoothing,
continuous-F0 interpolation, CheapTrick mcep + band aperiodicity, sine
excitation, dense dilation factors — is the framework's own
``prepare_sifigan_utterance`` (trainers/vocoder_trainer.py), dumped
per-utterance so ``serenade-vocoder-train --vocoder-type sifigan
--sifigan-feats-dir <dir>`` starts sampling segments immediately
instead of re-analyzing the corpus at startup.

Keys per <utt>.h5: ``c`` (T, mcep+bap), ``cf0`` (T,), ``sine``
(T*hop, S), ``dfs_<i>`` per upsample level, ``wave`` (T*hop,).
"""

from __future__ import annotations

import argparse
import logging
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav-scp", required=True)
    p.add_argument("--segments", default=None)
    p.add_argument("--dumpdir", required=True)
    p.add_argument("--shiftms", type=float, default=5.0)
    p.add_argument("--mcep-dim", type=int, default=39)
    p.add_argument("--minf0", type=float, default=70.0)
    p.add_argument("--maxf0", type=float, default=800.0)
    p.add_argument("--dense-factors", type=float, nargs="*",
                   default=[0.5, 1, 4, 8])
    p.add_argument("--upsample-scales", type=int, nargs="*",
                   default=[5, 4, 3, 2])
    p.add_argument("--verbose", type=int, default=1)
    args = p.parse_args()
    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: "
               "%(message)s")

    from serenade_tpu.datasets.audio_dataset import AudioSCPDataset
    from serenade_tpu.trainers.vocoder_trainer import (
        prepare_sifigan_utterance,
    )
    from serenade_tpu.utils.h5 import write_hdf5

    dataset = AudioSCPDataset(args.wav_scp, segments=args.segments,
                              return_utt_id=True)
    os.makedirs(args.dumpdir, exist_ok=True)
    n_done = n_skip = 0
    for utt_id, (audio, fs) in dataset:
        feats = prepare_sifigan_utterance(
            audio, fs, frame_period_ms=args.shiftms,
            mcep_dim=args.mcep_dim, f0_floor=args.minf0,
            f0_ceil=args.maxf0,
            dense_factors=tuple(args.dense_factors),
            upsample_scales=tuple(args.upsample_scales))
        if feats is None:
            logging.warning("%s: no voiced frames, skipped", utt_id)
            n_skip += 1
            continue
        out = os.path.join(args.dumpdir, f"{utt_id}.h5")
        write_hdf5(out, "c", feats["c"])
        write_hdf5(out, "cf0", feats["cf0"])
        write_hdf5(out, "sine", feats["sine"])
        write_hdf5(out, "wave", feats["wav"])
        for i, d in enumerate(feats["dfs"]):
            write_hdf5(out, f"dfs_{i}", d)
        n_done += 1
        logging.info("dumped %s (%d frames)", utt_id, feats["c"].shape[0])
    logging.info("done: %d dumped, %d skipped", n_done, n_skip)


def load_precomputed(feats_dir: str):
    """Read back the dumps into the trainer's item dicts."""
    import glob as _glob

    import h5py
    import numpy as np

    from serenade_tpu.utils.h5 import read_hdf5

    items = []
    for path in sorted(_glob.glob(os.path.join(feats_dir, "*.h5"))):
        with h5py.File(path, "r") as f:
            n_dfs = sum(1 for k in f.keys() if k.startswith("dfs_"))
        items.append({
            "c": np.asarray(read_hdf5(path, "c"), np.float32),
            "cf0": np.asarray(read_hdf5(path, "cf0"), np.float32),
            "sine": np.asarray(read_hdf5(path, "sine"), np.float32),
            "wav": np.asarray(read_hdf5(path, "wave"), np.float32),
            "dfs": [np.asarray(read_hdf5(path, f"dfs_{i}"), np.float32)
                    for i in range(n_dfs)],
        })
    return items


if __name__ == "__main__":
    main()
