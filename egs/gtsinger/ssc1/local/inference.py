#!/usr/bin/env python3
"""Standalone batch inference over an explicit file list (reference
local/inference.py role, minus its hardcoded research-scratch paths):
a thin wrapper that builds the argv for `serenade_tpu.bin.ssc_decode`.

Usage:
  python local/inference.py --dumpdir dump/test --stats dump/stats.joblib \
      --checkpoint exp/serenade/checkpoint-40000steps \
      --ref-dict conf/refstyles.json --outdir out/
"""

import sys

from serenade_tpu.bin.ssc_decode import main

if __name__ == "__main__":
    sys.argv = [sys.argv[0]] + sys.argv[1:]
    main()
