"""Export a trained experiment as a self-contained AOT deployment artifact.

`serenade-export` serializes the full decode hot path (normalization + CFM
inference + optional vocoder; reference ssc_decode.py:388-455) to StableHLO
programs with the weights baked in — see serenade_tpu/deploy.py.  The
resulting directory runs via ``serenade_tpu.deploy.load`` with no model
code, config registry, or checkpoint machinery.

Example:
    serenade-export --expdir exp/train_serenade --stats dump/stats.joblib \
        --out-dir exp/train_serenade/export \
        --buckets 512x512,1024x512,2048x1024 --platforms tpu,cpu
"""

from __future__ import annotations

import argparse
import logging


def _parse_buckets(spec: str):
    out = []
    for part in spec.split(","):
        ts, tr = part.lower().split("x")
        out.append((int(ts), int(tr)))
    return out


def main():
    p = argparse.ArgumentParser(
        description="export a trained SSC experiment to a StableHLO "
                    "deployment artifact")
    p.add_argument("--expdir", required=True,
                   help="experiment dir (config.yml + checkpoints)")
    p.add_argument("--stats", required=True, help="stats.joblib scaler")
    p.add_argument("--checkpoint", default=None,
                   help="specific checkpoint (default: latest in expdir)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--buckets", default="1024x512",
                   help="comma list of SRCxREF frame buckets, e.g. "
                        "'512x512,1024x512,2048x1024'; requests pad to the "
                        "smallest fitting bucket at run time")
    p.add_argument("--n-timesteps", type=int, default=None,
                   help="ODE steps baked into the exported programs "
                        "(default: the checkpoint config's "
                        "inference_n_timesteps — 2 for serenade-distill "
                        "outputs — else 10)")
    p.add_argument("--solver", default=None,
                   choices=("euler", "midpoint", "ab2"),
                   help="CFM solver (default: the checkpoint config's "
                        "inference_solver, else euler)")
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--quantize", default=None, choices=("int8",),
                   help="weight-only int8 quantization: int8 constants "
                        "in the artifact (~4x smaller) dequantized "
                        "per-channel inside the program; quality bound "
                        "in tests/test_quantize.py")
    p.add_argument("--platforms", default=None,
                   help="comma list (e.g. 'tpu,cpu'); default: current "
                        "backend + cpu")
    p.add_argument("--verbose", type=int, default=1)
    args = p.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    from serenade_tpu.api import Converter
    from serenade_tpu.deploy import export_converter

    conv = Converter(args.expdir, args.stats, checkpoint=args.checkpoint,
                     n_timesteps=args.n_timesteps, solver=args.solver,
                     temperature=args.temperature, quantize=args.quantize)
    platforms = (tuple(s.strip() for s in args.platforms.split(","))
                 if args.platforms else None)
    # conv.solver carries the resolved choice (explicit flag, else the
    # checkpoint config's inference_solver, else euler) — args.solver is
    # None when the flag was omitted
    manifest = export_converter(
        conv, args.out_dir, buckets=_parse_buckets(args.buckets),
        platforms=platforms, solver=conv.solver)
    logging.info("exported %d bucket program(s) to %s (platforms: %s)",
                 len(manifest["files"]), args.out_dir,
                 ",".join(manifest["platforms"]))


if __name__ == "__main__":
    main()
