#!/usr/bin/env python3
"""Build a Kaldi-style wav.scp (+ GT-MIDI csv) from a GTSinger directory
tree (reference local/create_wav_scp.py role).

utt_id = relative path with separators/spaces replaced by underscores.
`--flat` treats the directory as a flat wav dump (decode outputs),
skipping `_gt`/`_reference`/`_sifigan` artifacts.
"""

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--db-root", "--input_dir", required=True)
    p.add_argument("--out", "--output_file", required=True)
    p.add_argument("--flat", action="store_true")
    args = p.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    wavs = sorted(glob.glob(os.path.join(args.db_root, "**", "*.wav"),
                            recursive=True))
    midi_csv = os.path.join(os.path.dirname(args.out), "midi.csv")
    n = 0
    with open(args.out, "w") as scp, open(midi_csv, "w") as midi:
        for path in wavs:
            base = os.path.basename(path)
            if any(tag in base for tag in ("_reference", "_gt", "_sifigan")):
                if args.flat:
                    continue
            path = os.path.abspath(path)
            rel = os.path.relpath(path, args.db_root)
            utt_id = (
                rel.replace(os.sep, "_").replace("　", "_").replace(" ", "_")
            )[: -len(".wav")]
            scp.write(f"{utt_id} {path}\n")
            # GT score json sits beside the wav in GTSinger layout
            midi.write(f"{utt_id} {path.lstrip('/')}\n")
            n += 1
    print(f"wrote {n} entries to {args.out} (+ {midi_csv})")


if __name__ == "__main__":
    main()
