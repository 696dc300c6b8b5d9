#!/usr/bin/env python3
"""Inject `cyclic_logmel` into converted-utterance dumps for cyclic
fine-tuning (reference local/create_cyclic_dump.py): each converted
utterance's h5 gets its *source* utterance's logmel as `cyclic_logmel`,
so stage-7 training conditions on converted-audio features while targeting
the original mel.  Unconverted (reconstruction) dumps copy their own
logmel."""

import argparse
import glob
import os

from serenade_tpu.utils.h5 import read_hdf5, write_hdf5

STYLES = ("Pharyngeal", "Glissando", "Breathy", "Vibrato", "Falsetto",
          "Mixed_Voice")


def source_utt_id(utt_id: str):
    """Converted outputs are named `{src_utt}_{style}` (ssc_decode.py)."""
    for style in STYLES:
        suffix = f"_{style}"
        if utt_id.endswith(suffix):
            return utt_id[: -len(suffix)]
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src-dumpdir", required=True,
                   help="original train dump (source logmels)")
    p.add_argument("--cyclic-dumpdir", required=True,
                   help="dump of the converted train set")
    args = p.parse_args()

    h5s = sorted(glob.glob(os.path.join(args.cyclic_dumpdir, "*.h5")))
    n_ok = n_recon = n_miss = 0
    for h5_path in h5s:
        utt_id = os.path.splitext(os.path.basename(h5_path))[0]
        src_id = source_utt_id(utt_id)
        if src_id is None:
            cyclic_logmel = read_hdf5(h5_path, "logmel")  # reconstruction
            n_recon += 1
        else:
            src_path = os.path.join(args.src_dumpdir, f"{src_id}.h5")
            if not os.path.exists(src_path):
                print(f"warning: source dump missing for {utt_id}")
                n_miss += 1
                continue
            cyclic_logmel = read_hdf5(src_path, "logmel")
            n_ok += 1
        write_hdf5(h5_path, "cyclic_logmel", cyclic_logmel)
    print(f"cyclic_logmel injected: {n_ok} converted, {n_recon} "
          f"reconstructions, {n_miss} missing sources")


if __name__ == "__main__":
    main()
