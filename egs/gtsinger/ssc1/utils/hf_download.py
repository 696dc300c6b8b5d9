#!/usr/bin/env python3
"""Pretrained-asset fetch helper (reference utils/hf_download.py /
download_from_google_drive.sh role).

This build environment has no network egress; on a connected machine this
fetches the released checkpoints into ``pt_models/``:

  python utils/hf_download.py --repo lengyue233/content-vec-best \
      --out pt_models/contentvec.pt
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repo", required=True)
    p.add_argument("--filename", default="pytorch_model.bin")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    if os.path.exists(args.out):
        print(f"{args.out} already present")
        return
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub not installed and no egress here; stage the "
              f"file manually at {args.out}", file=sys.stderr)
        sys.exit(1)
    path = hf_hub_download(repo_id=args.repo, filename=args.filename)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    os.replace(path, args.out)
    print(f"downloaded {args.repo}/{args.filename} -> {args.out}")


if __name__ == "__main__":
    main()
