#!/usr/bin/env python3
"""Split the full GTSinger wav.scp into train/dev/test by song keyword
(reference local/create_gtsinger_splits.py: song2 -> dev, song3 -> test,
Speech_Group always dropped, Control/Vibrato/Glissando groups dropped from
test; every non-Speech line also lands in train, mirroring the reference's
behavior of training on all songs)."""

import argparse
import os

DEV_KEYWORDS = ("song2",)
TEST_KEYWORDS = ("song3",)
TEST_EXCLUDED = ("Control_Group", "Vibrato_Group", "Glissando_Group")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scp", "--wav-scp", required=True)
    p.add_argument("--outdir", required=True)
    args = p.parse_args()

    with open(args.scp) as f:
        lines = [ln for ln in f if ln.strip()]

    splits = {name: [] for name in ("train", "dev", "test")}
    for line in lines:
        if "Speech_Group" in line:
            continue
        if any(kw in line for kw in DEV_KEYWORDS):
            splits["dev"].append(line)
        elif any(kw in line for kw in TEST_KEYWORDS):
            if not any(kw in line for kw in TEST_EXCLUDED):
                splits["test"].append(line)
        splits["train"].append(line)

    for name, rows in splits.items():
        outdir = os.path.join(args.outdir, name)
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "wav.scp"), "w") as f:
            f.writelines(rows)
        print(f"{name}: {len(rows)} utterances")


if __name__ == "__main__":
    main()
