"""serenade-serve: online conversion server.

Beyond-reference serving entry point (the reference only ships offline
batch CLIs, ssc_decode.py): loads a trained experiment and serves
request-batched conversions over HTTP.  See serenade_tpu/serving.py for
the batching dispatcher and the wire format (npz bodies; client helpers
``serving.encode_request`` / ``serving.decode_response``).

Endpoints: POST ``/convert_features`` (npz feature upload),
``/convert_wav`` (raw RIFF + ``?style=`` or npz audio — ~48x less wire
traffic; needs ``--contentvec-ckpt``), ``/convert_stream`` (chunked
long-form), ``/register_reference``, GET ``/healthz``.

    serenade-serve --expdir exp/serenade --stats data/stats.joblib \
        --host 0.0.0.0 --port 8571 --max-batch 8 --max-wait-ms 10

Deployment mode: ``--artifact DIR`` serves an exported StableHLO
directory (``serenade-export``) instead — no model code, checkpoints, or
scaler pickles on the serving host.  /convert_features and
/register_reference work; the raw-audio/streaming endpoints (which need
on-host feature extraction) fault with a clear 400.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description="SSC conversion server")
    p.add_argument("--expdir", default=None,
                   help="experiment dir (config.yml + checkpoints)")
    p.add_argument("--stats", default=None, help="stats.joblib path")
    p.add_argument("--artifact", default=None,
                   help="serve an exported StableHLO artifact directory "
                        "(serenade-export) instead of a live experiment: "
                        "no model code, checkpoints, or scaler pickles "
                        "needed on the serving host.  Supports "
                        "/convert_features + /register_reference; the "
                        "raw-audio/streaming endpoints need --expdir")
    p.add_argument("--checkpoint", default=None,
                   help="explicit checkpoint (default: latest in expdir)")
    p.add_argument("--contentvec-ckpt", default=None)
    p.add_argument("--ref-dict", default=None,
                   help="refstyles.json (style name -> reference dump h5); "
                        "each style is registered device-resident at startup "
                        "so requests can pass just the style name")
    p.add_argument("--score-type", default="est_lf0_score")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--busy-hold-ms", type=float, default=2000.0,
                   help="extra time a non-full window may stay open while "
                        "a batch is in flight (waiting is free then); "
                        "tune above the steady-state batch time, or 0 "
                        "for latency-first serving")
    p.add_argument("--n-timesteps", type=int, default=None,
                   help="ODE steps per conversion (default: the checkpoint "
                        "config's inference_n_timesteps — 2 for "
                        "serenade-distill outputs — else 10)")
    p.add_argument("--solver", default=None,
                   choices=["euler", "midpoint", "ab2"],
                   help="CFM solver (default: the checkpoint config's "
                        "inference_solver, else euler)")
    p.add_argument("--data-axis", type=int, default=1,
                   help="shard batched dispatches over an N-way 'data' "
                        "mesh (serving on a pod slice)")
    p.add_argument("--f0-table", default=None,
                   help="voice-type F0 range yaml (conf/f0.yaml): lets "
                        "raw-audio requests pass ?voice_type=Tenor "
                        "instead of explicit ?f0_min=&f0_max=")
    p.add_argument("--max-request-seconds", type=float, default=600.0,
                   help="reject single requests longer than this (an "
                        "over-long utterance pads every co-batched "
                        "request to a giant bucket); streams included")
    p.add_argument("--warmup", action="append", default=[],
                   metavar="SRC:REF[:B]",
                   help="pre-compile/load the dispatch programs for this "
                        "(src_frames, ref_frames) shape at concurrency B "
                        "(default max-batch) before taking traffic; "
                        "repeatable.  First requests otherwise pay the "
                        "compile (docs/PROFILING.md)")
    p.add_argument("--warmup-raw", action="append", default=[],
                   metavar="SRC:REF[:B]",
                   help="same, for the raw-audio (/convert_wav) "
                        "extraction+conversion chain; needs "
                        "--contentvec-ckpt")
    p.add_argument("--quantize", default=None,
                   choices=("int8", "int8_compute"),
                   help="int8: weight-only int8 model weights (~4x "
                        "smaller device-resident params; RTF-neutral at "
                        "conversion shapes); int8_compute: additionally "
                        "run the estimator matmuls int8*int8 on the MXU "
                        "(quality bounds in tests/test_quantize.py)")
    p.add_argument("--verbose", type=int, default=1)
    return p


def build_app(args):
    """Assemble (server, batching) from parsed args — the whole CLI minus
    serve_forever, so tests can run the real entry path on an ephemeral
    port."""
    from serenade_tpu.serving import make_server

    if args.artifact:
        if args.expdir or args.stats:
            raise SystemExit("--artifact replaces --expdir/--stats")
        # model semantics are BAKED into the artifact at export time —
        # silently ignoring these flags would serve a different program
        # than the user asked for
        baked = {"--checkpoint": args.checkpoint,
                 "--contentvec-ckpt": args.contentvec_ckpt,
                 "--n-timesteps": args.n_timesteps,
                 "--solver": args.solver,
                 "--quantize": args.quantize}
        bad = [k for k, v in baked.items() if v is not None]
        if args.data_axis != 1:
            bad.append("--data-axis")
        if args.f0_table:
            # F0 ranges steer raw-audio extraction, which the artifact
            # server does not do — rejecting beats silently ignoring
            bad.append("--f0-table")
        if bad:
            raise SystemExit(
                f"{', '.join(bad)} cannot apply to an exported artifact "
                "(they are fixed at serenade-export time); re-export "
                "with the desired settings or serve with --expdir")
        from serenade_tpu.deploy import ArtifactService

        batching = ArtifactService(
            args.artifact, max_request_seconds=args.max_request_seconds)
        variant_new = bool(batching.manifest["variant_new"])
    elif not (args.expdir and args.stats):
        raise SystemExit("need --expdir and --stats (or --artifact)")
    else:
        from serenade_tpu.api import Converter
        from serenade_tpu.serving import BatchingConverter

        conv = Converter(
            args.expdir, args.stats, checkpoint=args.checkpoint,
            contentvec_ckpt=args.contentvec_ckpt,
            n_timesteps=args.n_timesteps, solver=args.solver,
            data_mesh=args.data_axis if args.data_axis > 1 else None,
            quantize=args.quantize,
        )
        batching = BatchingConverter(
            conv, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            busy_hold_ms=args.busy_hold_ms,
            max_request_seconds=args.max_request_seconds)
        variant_new = conv.variant_new
    if args.ref_dict:
        import json

        from serenade_tpu.utils.h5 import read_hdf5

        with open(args.ref_dict) as f:
            styles = json.load(f)
        for style, h5path in styles.items():
            feats = {
                "hubert": read_hdf5(h5path, "hubert"),
                "logmel": read_hdf5(h5path, "logmel"),
                "loud": np.asarray(read_hdf5(h5path, "loud")).reshape(-1, 1),
                "score": np.asarray(
                    read_hdf5(h5path, args.score_type)).reshape(-1, 1),
            }
            if variant_new:  # SerenadeNew dumps carry f0_fluc
                feats["f0_fluc"] = np.asarray(
                    read_hdf5(h5path, "f0_fluc")).reshape(-1, 1)
            batching.register_reference(style, feats)
            logging.info("registered reference style %r (%s)", style, h5path)
    if args.warmup or args.warmup_raw:
        if args.artifact:
            raise SystemExit("--warmup applies to a live model; exported "
                             "artifacts are AOT-compiled already")
        from serenade_tpu.serving import warmup_server

        def parse_shapes(specs):
            out = []
            for spec in specs:
                parts = spec.split(":")
                if len(parts) not in (2, 3):
                    raise SystemExit(
                        f"--warmup wants SRC:REF[:B], got {spec!r}")
                out.append((int(parts[0]), int(parts[1]),
                            int(parts[2]) if len(parts) == 3
                            else args.max_batch))
            return out

        if args.warmup:
            warmup_server(batching, parse_shapes(args.warmup))
        if args.warmup_raw:
            warmup_server(batching, parse_shapes(args.warmup_raw),
                          raw_audio=True)
    f0_table = None
    if args.f0_table:
        import yaml

        with open(args.f0_table) as f:
            f0_table = yaml.safe_load(f)
    server = make_server(batching, host=args.host, port=args.port,
                         f0_table=f0_table)
    return server, batching


def main(argv=None):
    args = build_argparser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s (%(module)s) %(levelname)s: %(message)s",
    )
    server, batching = build_app(args)
    logging.info("serving on %s:%d (max_batch=%d, wait=%.0fms)",
                 args.host, server.server_address[1], args.max_batch,
                 args.max_wait_ms)

    # SIGTERM (the supervisor/container stop signal) drains like Ctrl-C:
    # stop accepting, fault queued requests, exit 0 — not a hard kill
    # that leaves clients waiting out their timeouts
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logging.info("shutting down: draining the dispatch queue")
    finally:
        server.shutdown()
        batching.close()


if __name__ == "__main__":
    main()
