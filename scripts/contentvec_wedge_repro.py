#!/usr/bin/env python3
"""Minimal repro for the reported ContentVec preprocess-shape tunnel wedge.

Round 4 bypassed ContentVec in the full-budget run with the note "the
axon tunnel wedges on its conv stack" but left no repro or ROADMAP entry
(VERDICT r4 item 3).  This script dispatches the EXACT programs the
preprocess CLI runs — ``make_content_fn(...).batch`` on 2 s-bucketed
16 kHz waveforms — at increasing (duration, batch) shapes, with a
heartbeat and a per-dispatch wall-clock log, so a hang can be localized
to a specific program shape (compile vs execute) instead of "the conv
stack".

Run bounded:  timeout 1800 python scripts/contentvec_wedge_repro.py \
                  --ckpt pt_models/contentvec.pt
Each stage prints BEFORE dispatching; if the process dies on the
timeout, the last "dispatching..." line names the wedged shape.

The serving path runs the same encoder on 6 s utterances continuously
(BASELINE.md raw-audio rows), so the suspicion is preprocess-scale
shapes: ~10-30 s utterances, batch 8, several distinct bucket lengths
=> several multi-minute tunnel compiles of large-attention programs.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="pt_models/contentvec.pt")
    p.add_argument("--durations", type=float, nargs="*",
                   default=[6.0, 10.5, 12.6, 30.0])
    p.add_argument("--batches", type=int, nargs="*", default=[1, 8])
    p.add_argument("--out", default=None, help="write JSON results here")
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))

    import numpy as np

    t_start = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t_start:8.1f}s] {msg}", flush=True)

    log("loading checkpoint + building content_fn (the preprocess path)")
    from serenade_tpu.bin.preprocess import make_content_fn

    content_fn = make_content_fn(args.ckpt)
    log("content_fn ready (weights on device)")

    rng = np.random.default_rng(0)
    results = {}
    for dur in args.durations:
        n = int(16000 * dur)
        for b in args.batches:
            tag = f"dur{dur:g}s_b{b}"
            wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
                    for _ in range(b)]
            log(f"{tag}: dispatching (bucketed to "
                f"{-(-n // 32000) * 2} s)...")
            t0 = time.perf_counter()
            try:
                out = content_fn.batch(wavs)
                host = [np.asarray(o) for o in out]  # force fetch
                dt = time.perf_counter() - t0
                shape = host[0].shape
                finite = all(np.isfinite(h).all() for h in host)
                results[tag] = {"wall_s": round(dt, 2),
                                "frames": int(shape[0]),
                                "finite": bool(finite)}
                log(f"{tag}: OK {shape} in {dt:.1f}s (finite={finite})")
            except Exception as e:
                dt = time.perf_counter() - t0
                results[tag] = {"error": f"{type(e).__name__}: {e}"[:300],
                                "wall_s": round(dt, 2)}
                log(f"{tag}: FAILED after {dt:.1f}s: {e}")
            # second dispatch at the same shape = warm-cache cost
            t0 = time.perf_counter()
            try:
                out = content_fn.batch(
                    [w + np.float32(1e-4) for w in wavs])
                _ = [np.asarray(o) for o in out]
                results[tag]["warm_wall_s"] = round(
                    time.perf_counter() - t0, 2)
                log(f"{tag}: warm repeat {results[tag]['warm_wall_s']}s")
            except Exception as e:
                results[tag]["warm_error"] = str(e)[:200]

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
