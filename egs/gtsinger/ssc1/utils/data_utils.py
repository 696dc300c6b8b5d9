#!/usr/bin/env python3
"""Data-directory utilities (reference utils/{split_data.sh,
combine_data.sh,make_subset_data.sh} roles, one python tool):

  split    data/train N          -> data/train/split{1..N}/wav.scp
  combine  data/out data/a data/b ...  (concatenate wav.scp, unique keys)
  subset   data/train data/sub N      (first N utterances)
"""

import argparse
import os
import sys


def read_scp(d):
    path = os.path.join(d, "wav.scp")
    with open(path) as f:
        return [ln for ln in f if ln.strip()]


def write_scp(d, lines):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "wav.scp"), "w") as f:
        f.writelines(lines)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("split")
    sp.add_argument("datadir")
    sp.add_argument("n", type=int)
    cp = sub.add_parser("combine")
    cp.add_argument("outdir")
    cp.add_argument("indirs", nargs="+")
    bp = sub.add_parser("subset")
    bp.add_argument("datadir")
    bp.add_argument("outdir")
    bp.add_argument("n", type=int)
    args = p.parse_args()

    if args.cmd == "split":
        lines = read_scp(args.datadir)
        for i in range(args.n):
            write_scp(os.path.join(args.datadir, f"split{i + 1}"),
                      lines[i::args.n])
        print(f"split {len(lines)} utts into {args.n} shards")
    elif args.cmd == "combine":
        seen, out = set(), []
        for d in args.indirs:
            for ln in read_scp(d):
                key = ln.split()[0]
                if key in seen:
                    print(f"duplicate utt {key} skipped", file=sys.stderr)
                    continue
                seen.add(key)
                out.append(ln)
        write_scp(args.outdir, out)
        print(f"combined {len(out)} utts from {len(args.indirs)} dirs")
    elif args.cmd == "subset":
        lines = read_scp(args.datadir)[: args.n]
        write_scp(args.outdir, lines)
        print(f"subset of {len(lines)} utts written")


if __name__ == "__main__":
    main()
