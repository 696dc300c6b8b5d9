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


def ensure_contentvec_ckpt(work: str) -> str:
    """Random-weights FULL-SIZE ContentVec torch checkpoint (the released
    config; throughput-identical to real weights) for the raw-audio path."""
    path = os.path.join(work, "contentvec_random.pt")
    if os.path.exists(path):
        return path
    import torch
    import transformers

    config = transformers.HubertConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, classifier_proj_size=256,
        apply_spec_augment=False,
    )

    class HubertModelWithFinalProj(transformers.HubertModel):
        def __init__(self, config):
            super().__init__(config)
            self.final_proj = torch.nn.Linear(
                config.hidden_size, config.classifier_proj_size)

    torch.manual_seed(0)
    torch.save(HubertModelWithFinalProj(config).eval().state_dict(), path)
    return path


def synth_wav_request(rng, n_src_frames: int, sr: int = 24000):
    """A raw 24 kHz waveform request (the transfer-light serving path:
    ~48x smaller on the wire than 768-d features)."""
    n = n_src_frames * 240
    t = np.arange(n) / sr
    f0 = rng.uniform(150.0, 350.0)
    wav = 0.3 * np.sin(2 * np.pi * f0 * t * (1 + 0.01 * np.sin(2 * np.pi * 5 * t)))
    wav += 0.01 * rng.normal(size=n)
    return wav.astype(np.float32)


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
    ap.add_argument("--raw-audio", action="store_true",
                    help="clients POST raw waveforms against a registered "
                         "style (server-side mel/loudness/F0 + ContentVec "
                         "on device) instead of uploading 768-d features — "
                         "the transfer-bound fix for tunnel/WAN links")
    ap.add_argument("--stream-seconds", type=float, default=0.0,
                    help="instead of the throughput bench, measure "
                         "long-form RAW-AUDIO streaming: time-to-first-"
                         "audio and total time for one N-second source "
                         "(server-side extraction + chunked conversion)")
    ap.add_argument("--live-chunk", type=int, default=512,
                    help="live mode: conversion span frames (10 ms each)")
    ap.add_argument("--live-ctx", type=int, default=256,
                    help="live mode: extraction context frames per side")
    ap.add_argument("--live-overlap", type=int, default=64,
                    help="live mode: crossfade overlap frames")
    ap.add_argument("--live-seconds", type=float, default=0.0,
                    help="measure LIVE duplex conversion: feed an "
                         "N-second source as real-time-paced 100 ms "
                         "chunks through convert_wav_stream_live and "
                         "report how far each finalized segment trails "
                         "the live input")
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
                     n_timesteps=args.n_timesteps,
                     contentvec_ckpt=(ensure_contentvec_ckpt(work)
                                      if args.raw_audio
                                      or args.stream_seconds
                                      or args.live_seconds
                                      else None))
    b = BatchingConverter(conv, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms)
    rng = np.random.default_rng(0)
    src, ref = synth_request(rng, args.src_frames, args.ref_frames)

    if args.live_seconds:
        # LIVE duplex lag: chunks arrive at real time; a span converts
        # once chunk+ctx audio exists, so each finalized segment should
        # land (chunk+ctx+overlap)*10ms + compute behind its own end.
        # --live-chunk/--live-ctx/--live-overlap tighten the lookahead
        # (lower lag, more boundary approximation)
        b.register_reference("S", ref)
        n_frames = int(args.live_seconds * 100)
        knobs = dict(chunk_frames=args.live_chunk,
                     overlap_frames=args.live_overlap,
                     extract_ctx_frames=args.live_ctx)
        for run in range(3):  # run 0 warms the window programs
            r = np.random.default_rng(20 + run)
            wav = synth_wav_request(r, n_frames)
            piece = 2400  # 100 ms at 24 kHz

            def chunks():
                t0 = time.monotonic()
                for i, lo in enumerate(range(0, len(wav), piece)):
                    target = t0 + i * 0.1
                    delay = target - time.monotonic()
                    if delay > 0:
                        time.sleep(delay)
                    yield wav[lo:lo + piece]

            lags, t0 = [], time.monotonic()
            for start, mel_seg, _ in conv.convert_wav_stream_live(
                    chunks(), 24000, b.packed_reference("S"), **knobs):
                end_frame = start + mel_seg.shape[0]
                lags.append(time.monotonic() - t0 - end_frame / 100.0)
            total = time.monotonic() - t0
            tail = total - args.live_seconds
            print(f"live[{run}] {args.live_seconds:.0f}s source at "
                  f"real-time pace (chunk {args.live_chunk} ctx "
                  f"{args.live_ctx} overlap {args.live_overlap}): "
                  f"{len(lags)} segments, lag behind "
                  f"live mean {np.mean(lags):+.2f}s / max "
                  f"{np.max(lags):+.2f}s, done {tail:+.2f}s after the "
                  f"source ended")
        b.close()
        return

    if args.stream_seconds:
        # long-form raw streaming latency: extraction + chunked CFM,
        # first finalized segment = first audio a client could play
        b.register_reference("S", ref)
        n_frames = int(args.stream_seconds * 100)
        for run in range(3):  # run 0 warms the length bucket's programs
            r = np.random.default_rng(10 + run)
            wav = synth_wav_request(r, n_frames)
            # full-extraction baseline: extract everything, then stream
            t0 = time.monotonic()
            feats = conv.extract_from_wav_batch([wav], [24000])[0]
            t_extract = time.monotonic() - t0
            ttfa, n_segs = None, 0
            for start, mel_seg, _ in conv.convert_features_stream(
                    feats, b.packed_reference("S")):
                n_segs += 1
                if ttfa is None:
                    ttfa = time.monotonic() - t0
            total = time.monotonic() - t0
            print(f"stream[{run}] {args.stream_seconds:.0f}s source "
                  f"(full extraction): extract {t_extract:.2f}s, "
                  f"first audio {ttfa:.2f}s, total {total:.2f}s "
                  f"({n_segs} segments, "
                  f"RTF {total / args.stream_seconds:.4f})")
            # windowed extraction: per-chunk windows + ramped first chunk
            t0 = time.monotonic()
            ttfa_w, n_segs_w = None, 0
            for start, mel_seg, _ in conv.convert_wav_stream(
                    wav, 24000, b.packed_reference("S")):
                n_segs_w += 1
                if ttfa_w is None:
                    ttfa_w = time.monotonic() - t0
            total_w = time.monotonic() - t0
            print(f"stream[{run}] {args.stream_seconds:.0f}s source "
                  f"(windowed):  first audio {ttfa_w:.2f}s, "
                  f"total {total_w:.2f}s ({n_segs_w} segments, "
                  f"RTF {total_w / args.stream_seconds:.4f})")
        b.close()
        return

    if args.raw_audio:
        b.register_reference("S", ref)  # style registered once, on device

        def submit(r):
            # generous timeout: first-compile of the batched extraction
            # programs through a cold tunnel terminal can take >5 min
            b.convert_wav(synth_wav_request(r, args.src_frames), 24000, "S",
                          timeout=3600.0)
    else:
        def submit(r):
            b.convert(*synth_request(r, args.src_frames, args.ref_frames),
                      timeout=3600.0)

    # warmup: compile the bucket's batched programs (batch 1 and full)
    submit(rng)
    warm = [threading.Thread(target=submit, args=(np.random.default_rng(i),))
            for i in range(args.max_batch)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    base = dict(b.stats)

    latencies = []
    lock = threading.Lock()

    # pre-generate every request payload: synthesizing 6 s waveforms in
    # numpy inside the timed loop serializes the clients on the GIL
    # (tens of ms per round vs a 20 ms batching window), which halves
    # measured occupancy — a bench artifact, not a serving property
    if args.raw_audio:
        payloads = [
            [synth_wav_request(np.random.default_rng(100 + i), args.src_frames)
             for _ in range(args.requests_per_client)]
            for i in range(args.clients)]

        def send(i, k):
            b.convert_wav(payloads[i][k], 24000, "S", timeout=3600.0)
    else:
        payloads = [
            [synth_request(np.random.default_rng(100 + i), args.src_frames,
                           args.ref_frames)
             for _ in range(args.requests_per_client)]
            for i in range(args.clients)]

        def send(i, k):
            b.convert(*payloads[i][k], timeout=3600.0)

    def client(i):
        for k in range(args.requests_per_client):
            t0 = time.monotonic()
            send(i, k)
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
