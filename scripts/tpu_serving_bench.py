#!/usr/bin/env python3
"""Serving throughput on the real chip: concurrent clients against the
request-batching dispatcher (serenade_tpu/serving.py).

Builds a full-size experiment via the REAL training CLI (reusing
tpu_cli_train_check's workdir; runs prep+train if absent), then drives
BatchingConverter with N client threads posting realistic-length requests
and reports steady-state requests/sec, audio-sec/sec, mean/95p latency,
and batch occupancy.  Run: python scripts/tpu_serving_bench.py
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_experiment(work: str):
    from scripts.tpu_cli_train_check import stage_prep, stage_train

    dump = os.path.join(work, "dump")
    cfg = os.path.join(work, "config.yml")
    os.makedirs(dump, exist_ok=True)
    if not os.path.exists(os.path.join(work, "stats.joblib")):
        stage_prep(work, dump, cfg)
    from serenade_tpu.checkpoint import find_latest_checkpoint

    if find_latest_checkpoint(os.path.join(work, "exp")) is None:
        stage_train(work, dump, cfg)
    return work


def synth_request(rng, n_src: int, n_ref: int):
    """Feature dicts with realistic shapes/ranges (identity-ish scalers of
    the synthetic experiment make exact values uncritical for throughput)."""

    def feats(n):
        return {
            "hubert": rng.normal(size=(n, 768)).astype(np.float32) * 0.5,
            "score": rng.uniform(5.0, 6.5, size=(n, 1)).astype(np.float32),
            "loud": rng.uniform(-30.0, -5.0, size=(n, 1)).astype(np.float32),
        }

    src = feats(n_src)
    ref = feats(n_ref)
    ref["logmel"] = rng.normal(size=(n_ref, 80)).astype(np.float32)
    return src, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tpu_cli_check")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests-per-client", type=int, default=6)
    ap.add_argument("--src-frames", type=int, default=600)   # 6 s
    ap.add_argument("--ref-frames", type=int, default=300)   # 3 s
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--n-timesteps", type=int, default=10)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

    work = ensure_experiment(args.workdir)

    from serenade_tpu.api import Converter
    from serenade_tpu.serving import BatchingConverter

    conv = Converter(os.path.join(work, "exp"),
                     os.path.join(work, "stats.joblib"),
                     n_timesteps=args.n_timesteps)
    b = BatchingConverter(conv, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms)
    rng = np.random.default_rng(0)
    src, ref = synth_request(rng, args.src_frames, args.ref_frames)

    # warmup: compile the bucket's batched programs (batch 1 and full)
    b.convert(src, ref)
    warm = [threading.Thread(target=b.convert, args=synth_request(
        rng, args.src_frames, args.ref_frames)) for _ in range(args.max_batch)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    base = dict(b.stats)

    latencies = []
    lock = threading.Lock()

    def client(i):
        r = np.random.default_rng(100 + i)
        for _ in range(args.requests_per_client):
            s, rf = synth_request(r, args.src_frames, args.ref_frames)
            t0 = time.monotonic()
            b.convert(s, rf)
            dt = time.monotonic() - t0
            with lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t_start

    n = args.clients * args.requests_per_client
    audio_sec = n * args.src_frames * 0.01
    lat = np.array(latencies)
    batches = b.stats["batches"] - base["batches"]
    print(f"serving: {n} requests in {elapsed:.2f}s "
          f"({n/elapsed:.2f} req/s, {audio_sec/elapsed:.1f} audio-sec/sec)")
    print(f"latency mean {lat.mean()*1e3:.0f} ms  p95 {np.percentile(lat,95)*1e3:.0f} ms "
          f"(src {args.src_frames*0.01:.1f}s utterances)")
    print(f"batches {batches}  mean occupancy {n/max(batches,1):.2f} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    print(f"server-side RTF {(b.stats['compute_sec']-base['compute_sec'])/max(audio_sec,1e-9):.4f}")
    b.close()


if __name__ == "__main__":
    main()
