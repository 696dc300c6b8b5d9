#!/usr/bin/env python3
"""Split an scp file into N round-robin shards: wav.scp -> wav.{1..N}.scp
(reference utils/split_scp.pl + make_subset_data.sh role)."""

import sys
from pathlib import Path


def main():
    scp = Path(sys.argv[1])
    n = int(sys.argv[2])
    lines = [ln for ln in scp.read_text().splitlines() if ln.strip()]
    stem = scp.stem  # "wav"
    for i in range(n):
        shard = lines[i::n]
        out = scp.with_name(f"{stem}.{i + 1}{scp.suffix}")
        out.write_text("\n".join(shard) + ("\n" if shard else ""))
        print(f"{out}: {len(shard)} entries")


if __name__ == "__main__":
    main()
