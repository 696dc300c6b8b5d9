#!/usr/bin/env python3
"""Checkpoint-trend objective evaluation for the full-budget run.

For each saved checkpoint in ``--expdir``: decode the dev split with the
real decode CLI, pair every converted wav with its TRUE parallel target
(the same song rendered in the target style by make_synth_gtsinger.py),
and run serenade-evaluate (MCD / log-F0 RMSE / V/UV via the framework's
own analysis chain).  Emits ``trend.json`` + a markdown table — the
"loss/metric curves" deliverable of VERDICT round-3 item 1.

Pairing: decode writes ``<utt>_<style>.wav`` with utt =
``EN_<singer>_<song>_<SrcStyle>_Group_<num>``; the target is the corpus
wav of ``<song>`` in ``<style>``, looked up through data/all_wav.scp.
Targets are symlinked under the converted stem so evaluate pairs by
exact stem (no suffix stripping ambiguity with multi-token styles).
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys

STYLES = ("Breathy", "Falsetto", "Pharyngeal", "Mixed_Voice")


def list_checkpoints(expdir):
    out = []
    for d in glob.glob(os.path.join(expdir, "checkpoint-*steps")):
        m = re.match(r"checkpoint-(\d+)steps$", os.path.basename(d))
        if m:
            out.append((int(m.group(1)), d))
    return sorted(out)


def build_target_dir(converted_dir, scp_path, out_dir):
    """Symlink true parallel-target wavs under each converted stem."""
    utt2path = {}
    with open(scp_path) as f:
        for line in f:
            utt, path = line.strip().split(None, 1)
            utt2path[utt] = path
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for wav in sorted(glob.glob(os.path.join(converted_dir, "*.wav"))):
        stem = os.path.splitext(os.path.basename(wav))[0]
        if stem.endswith(("_reference", "_gt", "_sifigan")):
            continue
        tgt_style = next((s for s in STYLES if stem.endswith(f"_{s}")), None)
        if tgt_style is None:
            continue
        src_utt = stem[: -len(tgt_style) - 1]
        src_style = next((s for s in STYLES if f"_{s}_Group_" in src_utt),
                         None)
        if src_style is None:
            continue
        tgt_utt = src_utt.replace(f"_{src_style}_Group_",
                                  f"_{tgt_style}_Group_")
        tgt_path = utt2path.get(tgt_utt)
        if tgt_path is None:
            print(f"  no parallel target for {stem} (wanted {tgt_utt})")
            continue
        link = os.path.join(out_dir, f"{stem}.wav")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(tgt_path), link)
        n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--expdir", required=True)
    p.add_argument("--dumpdir", required=True)
    p.add_argument("--db-root", required=True)
    p.add_argument("--ref-dict", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--split", default="dev")
    p.add_argument("--scp", default="data/all_wav.scp")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--checkpoints", nargs="*", type=int, default=None,
                   help="step counts to evaluate (default: all saved)")
    args = p.parse_args()

    ckpts = list_checkpoints(args.expdir)
    if args.checkpoints:
        ckpts = [(s, d) for s, d in ckpts if s in args.checkpoints]
    if not ckpts:
        sys.exit(f"no checkpoints under {args.expdir}")
    print(f"evaluating {len(ckpts)} checkpoints: {[s for s, _ in ckpts]}")

    trend = []
    for steps, ckpt in ckpts:
        dec_dir = os.path.join(args.outdir, f"decoded_{steps}")
        res_json = os.path.join(args.outdir, f"metrics_{steps}.json")
        if os.path.exists(res_json):  # fully done on a previous run
            with open(res_json) as f:
                mean = json.load(f)["summary"]
            row = dict(steps=steps, mcd=mean.get("mcd_db"),
                       f0_rmse_cents=mean.get("f0_rmse_cents"),
                       vuv_error=mean.get("vuv_error"),
                       n_pairs=mean.get("n_utts"),
                       n_wavs=len(glob.glob(
                           os.path.join(dec_dir, "*.wav"))))
            print("  ", row)
            trend.append(row)
            continue
        done_marker = os.path.join(dec_dir, ".decode_done")
        prior = glob.glob(os.path.join(dec_dir, "*.wav"))
        expected = None
        if trend and trend[-1].get("n_wavs"):
            expected = trend[-1]["n_wavs"]
        complete = os.path.exists(done_marker) or (
            expected is not None and len(prior) >= expected)
        if prior and not complete:
            print(f"  decoded_{steps}: {len(prior)} wavs but no done "
                  "marker - redecoding")
            for w in prior:
                os.remove(w)
            prior = []
        try:
            if not prior:
                cmd = [
                    sys.executable, "-m", "serenade_tpu.bin.ssc_decode",
                    "--dumpdir", os.path.join(args.dumpdir, args.split),
                    "--stats", os.path.join(args.dumpdir, "stats.joblib"),
                    "--ref-dict", args.ref_dict,
                    "--outdir", dec_dir,
                    "--checkpoint", ckpt,
                    "--batch-size", str(args.batch_size),
                ]
                print("  decode:", " ".join(cmd[-8:]))
                subprocess.run(cmd, check=True)
                with open(done_marker, "w") as f:
                    f.write("done\n")

            tgt_dir = os.path.join(args.outdir, f"targets_{steps}")
            n = build_target_dir(dec_dir, args.scp, tgt_dir)
            print(f"  {n} (converted, parallel-target) pairs")
            if n == 0:
                raise RuntimeError(f"no eval pairs for step {steps}")

            if not os.path.exists(res_json):
                subprocess.run([
                    sys.executable, "-m", "serenade_tpu.bin.evaluate",
                    "--converted-dir", dec_dir,
                    "--target-dir", tgt_dir,
                    "--strip-suffixes",  # none: targets are linked per stem
                    "--out", res_json,
                ], check=True)
            with open(res_json) as f:
                res = json.load(f)
            mean = res["summary"]
            row = dict(steps=steps,
                       mcd=mean.get("mcd_db"),
                       f0_rmse_cents=mean.get("f0_rmse_cents"),
                       vuv_error=mean.get("vuv_error"),
                       n_pairs=n,
                       n_wavs=len(glob.glob(
                           os.path.join(dec_dir, "*.wav"))))
        except Exception as e:  # one bad checkpoint must not sink the trend
            print(f"  step {steps} FAILED: {e}", file=sys.stderr)
            row = dict(steps=steps, mcd=None, f0_rmse_cents=None,
                       vuv_error=None, n_pairs=0, error=str(e)[:200])
        print("  ", row)
        trend.append(row)

    with open(os.path.join(args.outdir, "trend.json"), "w") as f:
        json.dump(trend, f, indent=2)

    md = ["| steps | MCD (dB) | F0 RMSE (cents) | V/UV err |",
          "|---|---|---|---|"]
    for r in trend:
        if r["mcd"] is None:
            md.append(f"| {r['steps']} | FAILED | | |")
            continue
        f0s = ("n/a" if r["f0_rmse_cents"] is None
               else f"{r['f0_rmse_cents']:.1f}")
        md.append(f"| {r['steps']} | {r['mcd']:.3f} | "
                  f"{f0s} | {r['vuv_error']:.4f} |")
    table = "\n".join(md)
    with open(os.path.join(args.outdir, "trend.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
