#!/usr/bin/env python3
"""Praat TextGrid -> Kaldi segments converter (reference
utils/parse_textgrid.py role): reads interval tiers and writes
``seg_id utt_id start end`` lines for non-empty intervals."""

import argparse
import re
import sys


def parse_textgrid(path):
    """Minimal TextGrid parser: yields (tier_name, xmin, xmax, text)."""
    with open(path, errors="ignore") as f:
        content = f.read()
    tiers = re.split(r'item \[\d+\]:', content)[1:]
    for tier in tiers:
        name_m = re.search(r'name = "([^"]*)"', tier)
        tier_name = name_m.group(1) if name_m else "tier"
        for m in re.finditer(
            r'intervals \[\d+\]:\s*xmin = ([\d.]+)\s*xmax = ([\d.]+)\s*'
            r'text = "([^"]*)"', tier,
        ):
            yield tier_name, float(m.group(1)), float(m.group(2)), m.group(3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--textgrid", required=True)
    p.add_argument("--utt-id", required=True)
    p.add_argument("--tier", default=None, help="restrict to one tier")
    p.add_argument("--out", default="-")
    args = p.parse_args()

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    idx = 0
    for tier, xmin, xmax, text in parse_textgrid(args.textgrid):
        if args.tier and tier != args.tier:
            continue
        if not text.strip():
            continue
        out.write(f"{args.utt_id}-{idx:04d} {args.utt_id} {xmin:.3f} "
                  f"{xmax:.3f}\n")
        idx += 1
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
