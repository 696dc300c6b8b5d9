#!/usr/bin/env python3
"""Fast-mode quality-per-RTF table on a TRAINED checkpoint (VERDICT r4
item 6).

One axis for the serving-default decision: every fast conversion mode ×
(RTF at a standard shape, mel-cepstral distance to the bf16 euler-10
teacher on REAL dev utterances, resident artifact size).  Modes:

  euler10_bf16      the reference sampler (teacher; reference
                    flow_matching.py:40 — 10 Euler steps, temp 0.667)
  ab2_7             2nd-order Adams-Bashforth, 7 evals
  euler2            naive 2-step Euler on the UNDISTILLED field (floor
                    of what step-cutting alone does)
  int8_weights      weight-only int8 (dequant at load into the program)
  int8_compute      QDense int8×int8 MXU matmuls
  int8c_euler2      int8 compute + 2-step Euler (undistilled)
  distilled_euler2  2-step Euler on a distilled checkpoint
                    (--distilled-ckpt, from serenade-distill)
  distilled_int8c   distilled + int8 compute composed

MCD is computed per utterance over the true (unpadded) frames in the
normalized mel domain, the quantity the vocoder consumes; the DCT
cepstral metric matches tests/test_cfm_solvers.py::_mcd_db.

Usage (after the full-budget run):
  python scripts/fastmode_quality.py \
      --checkpoint egs/gtsinger/ssc1/exp/fullbudget/checkpoint-40000steps \
      --dumpdir egs/gtsinger/ssc1/dump_fb/dev \
      --stats egs/gtsinger/ssc1/dump_fb/stats.joblib \
      --ref-dict egs/gtsinger/ssc1/conf/refstyles_fullbudget.json \
      [--distilled-ckpt .../distilled/checkpoint-2000steps] \
      --out docs/FASTMODE_QUALITY.md
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))


def _mcd_db(a, b):
    """DCT-cepstral distance in dB, coefficient 0 (gain) excluded —
    same definition as tests/test_cfm_solvers.py::_mcd_db."""
    import numpy as np
    import scipy.fft

    ca = scipy.fft.dct(np.asarray(a, np.float64), type=2, axis=-1,
                       norm="ortho")
    cb = scipy.fft.dct(np.asarray(b, np.float64), type=2, axis=-1,
                       norm="ortho")
    d = ca[..., 1:] - cb[..., 1:]
    return float(np.mean(10.0 / np.log(10.0)
                         * np.sqrt(2.0 * np.sum(d * d, axis=-1))))


def tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--dumpdir", required=True)
    p.add_argument("--stats", required=True)
    p.add_argument("--ref-dict", required=True)
    p.add_argument("--distilled-ckpt", default=None)
    p.add_argument("--n-utts", type=int, default=8)
    p.add_argument("--pad-to", type=int, default=0,
                   help="static source frame count (0: max len -> 256s)")
    p.add_argument("--rtf-iters", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import joblib
    import numpy as np

    import serenade_tpu.models  # noqa: F401 (register model types)
    from serenade_tpu.bin.ssc_decode import _norm_ref, _pad2
    from serenade_tpu.checkpoint import restore_params_only
    from serenade_tpu.config import load_config, resolve
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.quantize import (
        dequantize_tree, quantize_dense_tree, quantize_tree,
    )

    cfg_path = args.config or os.path.join(
        os.path.dirname(args.checkpoint), "config.yml")
    config = load_config(cfg_path)
    scaler = joblib.load(args.stats)
    model = resolve("model", config["model_type"])(
        **dict(config.get("model_params", {})))
    params = restore_params_only(args.checkpoint)

    ds = FeatsDataset(root_dir=args.dumpdir, scaler=scaler,
                      score_type="est_lf0_score", return_utt_id=True)
    idxs = list(range(min(args.n_utts, len(ds))))
    items = [ds[i] for i in idxs]
    with open(args.ref_dict) as f:
        ref_dict = json.load(f)
    styles = sorted(ref_dict)
    refs = {s: _norm_ref(scaler, ref_dict[s]) for s in styles}

    t_src = args.pad_to or (
        -(-max(int(it["hubert"].shape[0]) for _, it in items) // 256) * 256)
    t_ref = -(-max(int(r["hubert"].shape[0]) for r in refs.values())
              // 256) * 256

    def src_batch(item):
        ln = min(int(item["hubert"].shape[0]), t_src)
        return dict(
            x=jnp.asarray(_pad2(item["hubert"], t_src))[None],
            lengths=jnp.array([ln]),
            midi=jnp.asarray(_pad2(item["score"], t_src))[None],
            loud=jnp.asarray(_pad2(item["loud"], t_src))[None],
        ), ln

    def ref_batch(r):
        ln = min(int(r["hubert"].shape[0]), t_ref)
        return dict(
            x=jnp.asarray(_pad2(r["hubert"], t_ref))[None],
            lengths=jnp.array([ln]),
            logmel=jnp.asarray(_pad2(r["logmel"], t_ref))[None],
            midi=jnp.asarray(_pad2(r["score"], t_ref))[None],
            loud=jnp.asarray(_pad2(r["loud"], t_ref))[None],
        )

    def make_infer(n_timesteps, solver, dequant=False):
        @jax.jit
        def infer(params, src, ref, key):
            if dequant:  # weight-only int8: dequantize in-program
                params = dequantize_tree(params)
            return model.apply(
                params, src["x"], src["lengths"], src["midi"], src["loud"],
                ref["x"], ref["lengths"], ref["logmel"], ref["midi"],
                ref["loud"], rng=key, n_timesteps=n_timesteps,
                solver=solver, method="inference")
        return infer

    params_int8w = jax.jit(quantize_tree)(params)
    params_int8c = jax.jit(quantize_dense_tree)(params)

    modes = {
        "euler10_bf16": (make_infer(10, "euler"), params),
        "ab2_7": (make_infer(7, "ab2"), params),
        "euler2": (make_infer(2, "euler"), params),
        "int8_weights": (make_infer(10, "euler", dequant=True),
                         params_int8w),
        "int8_compute": (make_infer(10, "euler"), params_int8c),
        "int8c_euler2": (make_infer(2, "euler"), params_int8c),
    }
    sizes_mb = {
        "euler10_bf16": tree_bytes(params) / 1e6,
        "ab2_7": tree_bytes(params) / 1e6,
        "euler2": tree_bytes(params) / 1e6,
        "int8_weights": tree_bytes(params_int8w) / 1e6,
        "int8_compute": tree_bytes(params_int8c) / 1e6,
        "int8c_euler2": tree_bytes(params_int8c) / 1e6,
    }
    if args.distilled_ckpt:
        dparams = restore_params_only(args.distilled_ckpt)
        dcfg = load_config(os.path.join(
            os.path.dirname(args.distilled_ckpt), "config.yml"))
        dsteps = int(dcfg.get("inference_n_timesteps", 2))
        modes[f"distilled_euler{dsteps}"] = (
            make_infer(dsteps, "euler"), dparams)
        sizes_mb[f"distilled_euler{dsteps}"] = tree_bytes(dparams) / 1e6
        dq = jax.jit(quantize_dense_tree)(dparams)
        modes[f"distilled_int8c_e{dsteps}"] = (make_infer(dsteps, "euler"),
                                               dq)
        sizes_mb[f"distilled_int8c_e{dsteps}"] = tree_bytes(dq) / 1e6

    # --- quality: every mode on the same (utt, style) pairs ------------
    key0 = jax.random.key(0)
    teacher_out = {}
    rows = {}
    for name, (fn, prm) in modes.items():
        dists = []
        t_wall = 0.0
        for ui, (utt_id, item) in enumerate(items):
            src, ln = src_batch(item)
            style = styles[ui % len(styles)]
            ref = ref_batch(refs[style])
            key = jax.random.fold_in(key0, ui)  # same noise across modes
            t0 = time.perf_counter()
            mel = fn(prm, src, ref, key)
            mel_np = np.asarray(mel[0])[:ln]
            t_wall += time.perf_counter() - t0
            if name == "euler10_bf16":
                teacher_out[ui] = mel_np
            else:
                dists.append(_mcd_db(mel_np, teacher_out[ui]))
        audio_sec = sum(min(int(it["hubert"].shape[0]), t_src)
                        for _, it in items) * 0.010
        rows[name] = {
            "mcd_to_teacher_db": (round(float(np.mean(dists)), 3)
                                  if dists else 0.0),
            "first_pass_rtf": round(t_wall / audio_sec, 5),
            "artifact_mb": round(sizes_mb[name], 1),
        }
        print(name, rows[name], flush=True)

    # --- steady-state RTF per mode (varied operands, scalar barrier) ---
    src0, ln0 = src_batch(items[0][1])
    ref0 = ref_batch(refs[styles[0]])
    for name, (fn, prm) in modes.items():
        for w in (1111, 2222):  # warmup outside the timed index range
            np.asarray(fn(prm, src0, ref0, jax.random.fold_in(key0, w)))
        t0 = time.perf_counter()
        out = None
        for i in range(args.rtf_iters):
            out = fn(prm, src0, ref0, jax.random.fold_in(key0, 10_000 + i))
        float(jnp.sum(out[0, 0]).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.rtf_iters
        rows[name]["rtf"] = round(dt / (ln0 * 0.010), 5)
        print(name, "steady rtf", rows[name]["rtf"], flush=True)

    hdr = ("| mode | RTF (steady, mel-only) | MCD to teacher (dB) | "
           "artifact (MB) |")
    md = [hdr, "|---|---|---|---|"]
    for name, r in rows.items():
        md.append(f"| {name} | {r['rtf']:.5f} | "
                  f"{r['mcd_to_teacher_db']:.3f} | {r['artifact_mb']} |")
    table = "\n".join(md)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
        with open(args.out.replace(".md", ".json"), "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
