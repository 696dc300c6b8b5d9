#!/usr/bin/env python3
"""Split an espnet-style utterance json into N parts for parallel jobs.

Counterpart of the reference's utils/splitjson.py
(/root/reference/utils/splitjson.py): a ``{"utts": {...}}`` json is
split into ``<dir>/split<N>utt/<name>.<i>.json`` with near-equal
utterance counts, so array jobs (utils/launch.sh) can each consume one
shard.  The scp-based twin for this recipe is utils/split_scp.py; this
exists for json-keyed corpora.
"""

import argparse
import json
import math
import os


def main():
    p = argparse.ArgumentParser(
        description="split a json file for parallel processing")
    p.add_argument("json", help="json file with a top-level 'utts' dict")
    p.add_argument("--parts", "-p", type=int, required=True,
                   help="number of subparts")
    args = p.parse_args()

    with open(args.json, encoding="utf-8") as f:
        j = json.load(f)
    utts = j["utts"] if "utts" in j else j
    keys = sorted(utts)
    if args.parts < 1 or args.parts > len(keys):
        raise SystemExit(
            f"--parts must be in [1, {len(keys)}], got {args.parts}")

    stem = os.path.basename(args.json).split(".")[0]
    outdir = os.path.join(os.path.dirname(args.json) or ".",
                          f"split{args.parts}utt")
    os.makedirs(outdir, exist_ok=True)

    per = math.ceil(len(keys) / args.parts)
    for i in range(args.parts):
        shard = keys[i * per:(i + 1) * per]
        out = os.path.join(outdir, f"{stem}.{i + 1}.json")
        with open(out, "w", encoding="utf-8") as f:
            json.dump({"utts": {k: utts[k] for k in shard}}, f,
                      indent=2, ensure_ascii=False, sort_keys=True)
        print(f"{out}: {len(shard)} utts")


if __name__ == "__main__":
    main()
