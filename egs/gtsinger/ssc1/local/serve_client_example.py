#!/usr/bin/env python3
"""Example client for the serenade-serve conversion server.

Reads a preprocessed source utterance (the h5 dumps stage 1 writes) OR a
raw wav, requests a conversion by registered style name, and writes the
result; optionally streams long sources chunk by chunk.

    python local/serve_client_example.py \
        --src dump/dev/utt.h5 --style Breathy --out converted.npz \
        [--host 127.0.0.1 --port 8571 --stream]
    python local/serve_client_example.py \
        --src source.wav --style Breathy --out converted.wav
        # raw-audio path: ~48x less upload; the server extracts features
        # on device (it must run with --contentvec-ckpt)

The server must be running with the styles registered, e.g.
    serenade-serve --expdir exp/serenade --stats dump/stats.joblib \
        --ref-dict conf/refstyles.json
"""

import argparse
import http.client

import numpy as np

from serenade_tpu.serving import (
    decode_response, encode_request, iter_stream_blocks,
)
from serenade_tpu.utils.h5 import read_hdf5


def load_src(h5path: str, score_type: str):
    return {
        "hubert": read_hdf5(h5path, "hubert"),
        "score": np.asarray(read_hdf5(h5path, score_type)).reshape(-1, 1),
        "loud": np.asarray(read_hdf5(h5path, "loud")).reshape(-1, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="source dump .h5")
    p.add_argument("--style", required=True, help="registered style name")
    p.add_argument("--out", required=True, help="output .npz (mel [+ wav])")
    p.add_argument("--score-type", default="est_lf0_score")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--stream", action="store_true",
                   help="use /convert_stream (prints chunks as they land)")
    p.add_argument("--live", action="store_true",
                   help="use /convert_stream_live: upload the wav as "
                        "real-time-paced PCM16 chunks over ONE duplex "
                        "connection and print segments as they return "
                        "while the upload is still running")
    args = p.parse_args()

    if args.live:
        return _live(args)
    conn = http.client.HTTPConnection(args.host, args.port, timeout=600)
    if args.src.endswith(".wav") and args.stream:
        # long-form raw audio: server-side extraction + chunked stream
        from urllib.parse import quote

        with open(args.src, "rb") as f:
            conn.request(
                "POST", f"/convert_stream?style={quote(args.style)}",
                body=f.read())
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        mels, wavs, sr = [], [], None
        for blk in iter_stream_blocks(resp):
            print(f"  segment @frame {int(blk['start'])}: "
                  f"{blk['mel'].shape[0]} frames")
            mels.append(blk["mel"])
            if "wav" in blk:
                wavs.append(blk["wav"])
                sr = int(blk["sr"])
        out = {"mel": np.concatenate(mels, axis=0)}
        if wavs:
            out["wav"], out["sr"] = np.concatenate(wavs), sr
        np.savez(args.out, **out)
        print(f"wrote {args.out}")
        return
    if args.src.endswith(".wav"):
        from urllib.parse import quote

        with open(args.src, "rb") as f:
            conn.request("POST", f"/convert_wav?style={quote(args.style)}",
                         body=f.read())
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        body = resp.read()
        if resp.getheader("Content-Type") == "audio/wav":
            with open(args.out, "wb") as f:
                f.write(body)
            print(f"wrote {args.out} ({len(body)} bytes of audio)")
        else:
            import io

            # np.savez appends .npz when the name lacks it — report the
            # file that actually exists
            out = args.out if args.out.endswith(".npz") else args.out + ".npz"
            with np.load(io.BytesIO(body)) as z:
                np.savez(out, mel=z["mel"])
            print(f"wrote {out} (mel only; server has no vocoder)")
        return

    src = load_src(args.src, args.score_type)
    body = encode_request(src, args.style)

    if args.stream:
        conn.request("POST", "/convert_stream", body=body)
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        mels, wavs, sr = [], [], None
        for blk in iter_stream_blocks(resp):
            print(f"  segment @frame {int(blk['start'])}: "
                  f"{blk['mel'].shape[0]} frames")
            mels.append(blk["mel"])
            if "wav" in blk:
                wavs.append(blk["wav"])
                sr = int(blk["sr"])
        mel = np.concatenate(mels, axis=0)
        wav = np.concatenate(wavs, axis=0) if wavs else None
    else:
        conn.request("POST", "/convert_features", body=body)
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        mel, wav, sr = decode_response(resp.read())

    out = {"mel": mel}
    if wav is not None:
        out["wav"], out["sr"] = wav, np.int64(sr)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: mel {mel.shape}"
          + (f", wav {wav.shape} @ {sr} Hz" if wav is not None else ""))


def _live(args):
    """Duplex live upload: PCM16 chunks paced at real time go up while
    converted segments come back on the same socket (the mic-capture
    shape of serving; here the 'mic' replays a wav file)."""
    import socket
    import threading
    import time
    from urllib.parse import quote

    from serenade_tpu.utils.audio import read_wav

    wav, sr = read_wav(args.src)
    pcm = np.clip(np.round(np.asarray(wav) * 32768.0), -32768,
                  32767).astype("<i2").tobytes()
    piece = sr // 10 * 2  # 100 ms of PCM16

    s = socket.create_connection((args.host, args.port), timeout=600)
    s.sendall(
        f"POST /convert_stream_live?style={quote(args.style)}&sr={sr} "
        f"HTTP/1.1\r\nHost: {args.host}\r\n"
        f"Transfer-Encoding: chunked\r\n\r\n".encode())

    done_upload = [False]

    def upload():
        t0 = time.monotonic()
        for i, lo in enumerate(range(0, len(pcm), piece)):
            # pace at real time, like a capture device
            target = t0 + i * 0.1
            delay = target - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            data = pcm[lo:lo + piece]
            s.sendall(f"{len(data):X}\r\n".encode() + data + b"\r\n")
        s.sendall(b"0\r\n\r\n")
        done_upload[0] = True

    threading.Thread(target=upload, daemon=True).start()

    # parse the response off the same socket as it arrives
    f = s.makefile("rb")
    status = f.readline()
    assert b"200" in status, status
    while f.readline() not in (b"\r\n", b""):
        pass

    # feed iter_stream_blocks through a de-chunking reader
    pending = [b""]

    def read(n):
        while len(pending[0]) < n:
            head = f.readline()
            if not head:
                break
            size = int(head.strip() or b"0", 16)
            if size == 0:
                f.readline()
                break
            pending[0] += f.read(size)
            f.read(2)
        out, pending[0] = pending[0][:n], pending[0][n:]
        return out

    mels, wavs, out_sr = [], [], None
    t0 = time.monotonic()
    for blk in iter_stream_blocks(read, strict=False):
        end_frame = int(blk["start"]) + blk["mel"].shape[0]
        lag = time.monotonic() - t0 - end_frame / 100.0
        live = "" if done_upload[0] else "  (upload still running)"
        print(f"  segment @frame {int(blk['start'])}: "
              f"{blk['mel'].shape[0]} frames, lag behind live "
              f"{lag:+.2f}s{live}")
        mels.append(blk["mel"])
        if "wav" in blk:
            wavs.append(blk["wav"])
            out_sr = int(blk["sr"])
    s.close()
    out = {"mel": np.concatenate(mels, axis=0)}
    if wavs:
        out["wav"], out["sr"] = np.concatenate(wavs), np.int64(out_sr)
    np.savez(args.out, **out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
