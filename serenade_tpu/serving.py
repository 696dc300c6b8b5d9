"""Online serving: request-batching conversion server.

Production-serving face of the framework, beyond the reference's offline
CLIs (its closest analogue is the per-utterance loop of
serenade/bin/ssc_decode.py:344-455, batch=1 by construction).  Two layers:

* ``BatchingConverter`` — wraps :class:`serenade_tpu.api.Converter` with a
  submission queue and a dispatcher thread that groups concurrent requests
  by (source-bucket, reference-bucket-or-style) and runs each group
  through ONE batched jitted inference (one batched vocoder dispatch
  too).  Static bucket shapes mean a handful of compiled programs serve
  every request size; batching amortizes the per-dispatch tunnel/PCIe
  latency and fills the MXU.  Styles registered once stay device
  resident.
* ``make_server`` — a dependency-free stdlib HTTP front
  (``ThreadingHTTPServer``): POST ``/convert_features`` /
  ``/register_reference`` / streaming ``/convert_stream`` with ``.npz``
  bodies, POST ``/convert_wav`` (raw RIFF or npz audio in, wav out —
  ~48x less wire traffic than feature upload; the fast path on
  transfer-bound links), GET ``/healthz`` for liveness + rolling stats.

Durability: a request that fails (bad payload, feature mismatch) fails
alone — the dispatcher catches per-batch errors and faults only that
batch's requests, never the server.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def validate_feature_dict(feats, what: str, with_mel: bool,
                          content_dim: int, num_mels: int,
                          variant_new: bool,
                          max_frames: int | None = None) -> None:
    """The submit-time feature contract, shared by the live batching
    server (dims from the scaler) and the artifact server (dims from the
    manifest): reject malformed dicts BEFORE they reach a batched
    dispatch, so a bad payload fails alone.  ``max_frames`` caps request
    duration (over-long requests pad every co-batched neighbor to a
    giant bucket)."""
    need = ["hubert", "score", "loud"] + (["logmel"] if with_mel else [])
    if variant_new:
        need.append("f0_fluc")
    for k in need:
        if k not in feats:
            raise ValueError(f"{what} missing feature {k!r}")
    hub = np.asarray(feats["hubert"])
    if hub.ndim != 2 or hub.shape[1] != content_dim:
        raise ValueError(
            f"{what} hubert must be (T, {content_dim}); got {hub.shape}")
    if max_frames is not None and hub.shape[0] > max_frames:
        raise ValueError(
            f"{what} is {hub.shape[0]} frames, over the server's "
            f"per-request cap of {max_frames} (max_request_seconds)")
    if with_mel:
        mel = np.asarray(feats["logmel"])
        if mel.ndim != 2 or mel.shape[1] != num_mels:
            raise ValueError(
                f"{what} logmel must be (T, {num_mels}); got {mel.shape}")


def check_registry_capacity(refs, name: str, max_references: int) -> None:
    """Reference-registry cap (call under the registry lock): each
    registration pins features resident, so an unbounded registry is a
    memory-exhaustion vector on a reachable port.  Re-registering an
    existing name is always allowed."""
    if name not in refs and len(refs) >= max_references:
        raise ValueError(
            f"reference registry full ({max_references}); "
            "re-register an existing name or raise max_references")


def check_f0_range(f0_range):
    """Validate an optional (minf0, maxf0) Hz pair at submit time (a bad
    range would otherwise fault inside a batched extraction)."""
    if f0_range is None:
        return None
    lo, hi = float(f0_range[0]), float(f0_range[1])
    if not (0.0 < lo < hi <= 4000.0):
        raise ValueError(
            f"f0_range must satisfy 0 < minf0 < maxf0 <= 4000 Hz; "
            f"got ({lo}, {hi})")
    return (lo, hi)


@dataclass
class _Request:
    src: Optional[Dict[str, np.ndarray]]
    # either a feature dict (ad-hoc reference) or a registered style name
    ref: object
    # raw-audio requests: (wav, sr) materialized to src/ref features by
    # the dispatcher in BATCHED device programs
    raw_src: Optional[tuple] = None
    raw_ref: Optional[tuple] = None
    # optional (minf0, maxf0) F0 search range for raw extraction (the
    # per-voice-type ranges of reference preprocess.py:475-493)
    f0_range: Optional[tuple] = None
    done: threading.Event = field(default_factory=threading.Event)
    mel: Optional[np.ndarray] = None
    wav: Optional[np.ndarray] = None
    sr: Optional[int] = None
    error: Optional[Exception] = None


class BatchingConverter:
    """Groups concurrent conversion requests into batched dispatches.

    Args:
        converter: a loaded :class:`serenade_tpu.api.Converter`.
        max_batch: largest group per dispatch.
        max_wait_ms: how long the dispatcher holds a non-full group open
            for stragglers.  Latency floor for a lone request.
        busy_hold_ms: how much LONGER a non-full window may stay open
            while a previously launched batch is still in flight —
            waiting is free then (the chip is busy), and it refills
            windows that the launch/fetch pipeline would otherwise
            fragment.  Must exceed the steady-state batch time to bite;
            it exists to cap the hold when an in-flight batch stalls for
            minutes on a first compile.
    """

    def __init__(self, converter, max_batch: int = 8,
                 max_wait_ms: float = 10.0, max_references: int = 64,
                 busy_hold_ms: float = 2000.0,
                 max_request_seconds: float = 600.0):
        self._conv = converter
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1000.0
        self._busy_hold = busy_hold_ms / 1000.0
        self._max_references = max_references
        # per-request duration cap: an over-long utterance pads the whole
        # co-batched window to its bucket (device memory + a giant
        # compile), so one hostile/mistaken request could stall every
        # client — reject at submit time instead
        self.max_request_seconds = float(max_request_seconds)
        cfg = converter.config
        self._frames_per_sec = (float(cfg.get("sampling_rate", 24000))
                                / float(cfg.get("hop_size", 240)))
        self._inflight = 0  # launched-but-unfinished batches (see _lock)
        self._dispatcher_done = False  # set when _dispatch_loop exits
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "audio_sec": 0.0, "compute_sec": 0.0}
        self._refs: Dict[str, object] = {}
        self._raw_refs: Dict[str, Dict[str, np.ndarray]] = {}
        # launched-but-unfetched batches: the dispatcher thread only
        # DISPATCHES device work (async under JAX); the finisher thread
        # blocks on the device_get, so window N+1's host→device upload
        # overlaps window N's compute + fetch.  Bounded to keep at most a
        # few batches of device arrays pinned (back-pressure on launch).
        self._completions: "queue.Queue" = queue.Queue(maxsize=4)
        self._finisher = threading.Thread(target=self._finish_loop,
                                          daemon=True, name="ssc-finisher")
        self._finisher.start()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True, name="ssc-dispatcher")
        self._thread.start()

    # -- client side ----------------------------------------------------

    def register_reference(self, name: str, ref_feats) -> None:
        """Register a named style reference.  Its normalized features are
        packed once and kept device-resident — requests that pass the name
        skip the reference upload entirely (the production pattern: the
        style set is small and fixed, conf/refstyles.json).

        Capped at ``max_references`` distinct styles (re-registering an
        existing name is always allowed): each registration pins features
        device-resident, so an unbounded registry is a memory-exhaustion
        vector on a reachable port."""
        self._validate_feats(ref_feats, "ref", with_mel=True)
        packed = self._conv.pack_reference(ref_feats)
        raw = {k: np.asarray(v) for k, v in ref_feats.items()}
        with self._lock:  # check+insert atomic: handler threads race here
            check_registry_capacity(self._refs, name, self._max_references)
            # raw first: _refs gates availability, so a concurrent lookup
            # that passes the gate must already find the raw copy
            self._raw_refs[name] = raw
            self._refs[name] = packed

    def reference_names(self):
        return sorted(self._refs)

    @property
    def converter(self):
        """The underlying api.Converter (e.g. for streaming paths that
        bypass the batching queue)."""
        return self._conv

    def _require_style(self, name: str) -> None:
        if name not in self._refs:
            raise KeyError(f"unknown reference style {name!r}; "
                           f"registered: {self.reference_names()}")

    def raw_reference(self, name: str):
        """Registered style's raw feature dict (for the streaming path)."""
        self._require_style(name)
        return self._raw_refs[name]

    def packed_reference(self, name: str):
        """Registered style's device-resident packed handle — the
        streaming paths condition on it directly, skipping the
        per-request reference normalization + upload."""
        self._require_style(name)
        return self._refs[name]

    def _validate_feats(self, feats, what: str, with_mel: bool,
                        cap_duration: bool = True) -> None:
        """Reject malformed feature dicts AT SUBMIT time: conversion is
        batched across the pending window, so a bad payload that only
        failed inside the dispatch would collateral-fault every
        co-batched request ('fails alone' durability contract).
        ``cap_duration=False`` skips the max_request_seconds frame cap
        (streaming sources convert in bounded windows off the queue)."""
        validate_feature_dict(
            feats, what, with_mel,
            content_dim=np.asarray(
                self.converter.scaler["hubert"].mean_).shape[0],
            num_mels=np.asarray(
                self.converter.scaler["logmel"].mean_).shape[0],
            variant_new=self.converter.variant_new,
            max_frames=(int(self.max_request_seconds
                            * self._frames_per_sec)
                        if cap_duration else None))

    def _check_open(self) -> None:
        if self._stop.is_set():
            # post-close submits would sit on the queue for their full
            # timeout — no thread will ever service them
            raise RuntimeError("server shutting down")

    def convert(self, src_feats, ref, timeout: float = 300.0):
        """Blocking submit; returns (mel, wav|None, sr|None).

        ``ref`` is a feature dict (ad-hoc) or a registered style name.
        Thread-safe: many callers batch together transparently.
        """
        self._check_open()
        try:
            self._validate_feats(src_feats, "src", with_mel=False)
            if isinstance(ref, str):
                self._require_style(ref)
            else:
                self._validate_feats(ref, "ref", with_mel=True)
        except (ValueError, KeyError):
            with self._lock:
                self.stats["errors"] += 1
            raise
        req = _Request(src=src_feats, ref=ref)
        self._queue.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("conversion timed out")
        if req.error is not None:
            raise req.error
        return req.mel, req.wav, req.sr

    def convert_wav(self, src_wav, sr: int, ref, timeout: float = 300.0,
                    f0_range=None):
        """Raw-audio submit: the request enqueues with its waveform and the
        DISPATCHER extracts features for the whole pending window in
        batched device programs (mel/loudness/F0 vmapped per length
        bucket + batched ContentVec — the preprocessing fast path), then
        converts as usual.  ``ref`` is a registered style name or a
        (ref_wav, ref_sr) tuple.  The raw-audio wire payload is ~48x
        smaller than pre-extracted 768-d content features — on
        transfer-bound links (tunnel, WAN) this is the fast path.

        ``f0_range=(minf0, maxf0)`` narrows the F0 search to the singer's
        range (reference preprocess uses per-voice-type ranges,
        conf/f0.yaml); applies to the inline reference too."""
        from serenade_tpu.features import validate_waveform

        f0_range = check_f0_range(f0_range)

        # validate HERE so a malformed request faults alone at submit time
        # (extraction is batched across the whole pending window — one bad
        # waveform must not collateral-fault other clients' requests)
        self._check_open()
        src_wav = validate_waveform(src_wav, "src_wav")
        if len(src_wav) > self.max_request_seconds * sr:
            raise ValueError(
                f"src_wav is {len(src_wav) / sr:.0f}s, over the server's "
                f"per-request cap of {self.max_request_seconds:.0f}s "
                "(max_request_seconds; use /convert_stream for long "
                "sources)")
        if isinstance(ref, str):
            self._require_style(ref)
            req = _Request(src=None, ref=ref, raw_src=(src_wav, sr),
                           f0_range=f0_range)
        else:
            ref_wav, ref_sr = ref
            ref_wav = validate_waveform(ref_wav, "ref_wav")
            if len(ref_wav) > self.max_request_seconds * ref_sr:
                raise ValueError(
                    f"ref_wav is {len(ref_wav) / ref_sr:.0f}s, over the "
                    "server's per-request cap "
                    f"of {self.max_request_seconds:.0f}s")
            req = _Request(src=None, ref=None, raw_src=(src_wav, sr),
                           raw_ref=(ref_wav, ref_sr), f0_range=f0_range)
        self._queue.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("conversion timed out")
        if req.error is not None:
            raise req.error
        return req.mel, req.wav, req.sr

    def close(self, join_timeout: float = 5.0):
        self._stop.set()
        self._thread.join(timeout=join_timeout)
        self._finisher.join(timeout=join_timeout)
        if self._thread.is_alive() or self._finisher.is_alive():
            # an in-flight dispatch/fetch outlived the join (e.g. a first
            # compile through the tunnel takes minutes): fault everything
            # still queued here so blocked callers fail now instead of
            # waiting out their full submit timeout
            logger.warning(
                "dispatcher still busy after %.1fs; faulting queued requests",
                join_timeout)
            for q in (self._queue, self._completions):
                while True:
                    try:
                        item = q.get_nowait()
                    except queue.Empty:
                        break
                    if isinstance(item, tuple):
                        reqs = item[0]
                        # keep the busy accounting honest for the (still
                        # alive) dispatcher's busy-hold checks
                        with self._lock:
                            self._inflight -= 1
                    else:
                        reqs = [item]
                    for req in reqs:
                        req.error = RuntimeError("server shutting down")
                        req.done.set()

    # -- dispatcher side ------------------------------------------------

    def _bucket(self, req: _Request):
        from serenade_tpu.collaters.ssc import bucket_length

        ts = bucket_length(req.src["hubert"].shape[0])
        if isinstance(req.ref, str):
            return (ts, req.ref)
        return (ts, bucket_length(req.ref["hubert"].shape[0]))

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            pending = [first]
            deadline = time.monotonic() + self._max_wait
            # while a launched batch is still in flight, waiting costs
            # nothing (the chip is busy anyway) — hold the window open
            # past max_wait for a fuller batch, capped by busy_hold so a
            # minutes-long first compile can't starve a lone request
            hard_deadline = deadline + self._busy_hold
            # hold the window open for stragglers (any bucket: grouping
            # happens below, so a mixed burst still batches per bucket)
            while len(pending) < self._max_batch:
                if self._stop.is_set():
                    break  # shutting down: launch what we have, now
                now = time.monotonic()
                if now >= deadline:
                    with self._lock:
                        busy = self._inflight > 0
                    if not busy or now >= hard_deadline:
                        break
                    timeout = min(0.005, hard_deadline - now)
                else:
                    timeout = deadline - now
                try:
                    pending.append(self._queue.get(timeout=timeout))
                except queue.Empty:
                    pass  # loop re-evaluates deadline/busy/stop state
            pending = self._materialize_raw(pending)
            groups = defaultdict(list)
            for req in pending:
                try:
                    key = self._bucket(req)
                except Exception as e:  # noqa: BLE001 — malformed request
                    req.error = e
                    req.done.set()
                    with self._lock:
                        self.stats["errors"] += 1
                    continue
                groups[key].append(req)
            for (ts, tr), reqs in groups.items():
                self._run_group(reqs, ts, tr)
        # shutdown: fault anything still queued instead of letting callers
        # block out their full timeout
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.error = RuntimeError("server shutting down")
            req.done.set()
        # everything this thread will ever launch is now in _completions;
        # the finisher keys its own exit on this flag (see _finish_loop)
        self._dispatcher_done = True

    def _materialize_raw(self, pending):
        """Batch-extract features for raw-audio requests in the window
        (one vmapped signal program per length bucket + batched ContentVec
        dispatches); a request whose extraction fails faults alone."""
        raws = [r for r in pending if r.raw_src is not None]
        if not raws:
            return pending
        wavs, srs, owners, ranges = [], [], [], []
        for r in raws:
            wavs.append(r.raw_src[0])
            srs.append(r.raw_src[1])
            owners.append((r, "src"))
            ranges.append(r.f0_range)
            if r.raw_ref is not None:
                wavs.append(r.raw_ref[0])
                srs.append(r.raw_ref[1])
                owners.append((r, "ref"))
                ranges.append(r.f0_range)
        try:
            feats = self._conv.extract_from_wav_batch(wavs, srs,
                                                      f0_ranges=ranges)
        except Exception as e:  # noqa: BLE001 — fault the raw subset
            logger.exception("raw-audio extraction failed for %d requests",
                             len(raws))
            with self._lock:
                self.stats["errors"] += len(raws)
            for r in raws:
                r.error = e
                r.done.set()
            return [r for r in pending if r.raw_src is None]
        for (r, slot), f in zip(owners, feats):
            if r.error is not None:
                continue
            if f is None:
                r.error = ValueError(f"feature extraction failed ({slot})")
                continue
            if slot == "src":
                r.src = f
            else:
                r.ref = f
        out = []
        for r in pending:
            if r.error is not None:
                with self._lock:
                    self.stats["errors"] += 1
                r.done.set()
            else:
                out.append(r)
        return out

    def _run_group(self, reqs, ts: int, tr):
        """LAUNCH a group's device work and hand its (deferred) fetch to
        the finisher thread.  JAX dispatches are async, so returning here
        lets the dispatcher start uploading the next window while this
        one computes; the blocking device_get happens in `_finish_loop`."""
        try:
            t0 = time.monotonic()
            # pow2 batch padding: bounded program count per bucket pair
            # (a fresh conversion program per distinct group size would
            # stall live traffic for minutes on slow-compile links)
            common = dict(ts=ts, pad_batch_pow2=True, return_device=True)
            if isinstance(tr, str):  # registered style: device-resident ref
                mels_dev, lens = self._conv.convert_features_batch(
                    [r.src for r in reqs], packed_ref=self._refs[tr],
                    **common,
                )
            else:
                mels_dev, lens = self._conv.convert_features_batch(
                    [r.src for r in reqs], [r.ref for r in reqs], tr=tr,
                    **common,
                )
            b = len(reqs)
            voc = self._conv.vocoder
            device_tail = (voc is not None
                           and hasattr(voc, "decode_batch_device"))
            if (device_tail and self._conv.mesh is not None
                    and getattr(voc, "_mesh", None) is None):
                if hasattr(voc, "place_on_mesh"):
                    # replicate generator params over the dp mesh once so
                    # the tail runs SPMD on the mesh-sharded mels
                    voc.place_on_mesh(self._conv.mesh)
                else:  # custom vocoder without mesh support: host path
                    device_tail = False
            y16 = None
            if device_tail:
                # device chain: edge-pad + generator + int16 quantize in
                # one jitted program — the mel is fetched once (for the
                # client) and never re-uploaded, and the waveform comes
                # back as int16 (the PCM16 the RIFF writer emits anyway),
                # halving the fetch on slow links
                bp = mels_dev.shape[0]
                y16 = voc.decode_batch_device(
                    mels_dev, lens + [lens[-1]] * (bp - b))
        except Exception as e:  # noqa: BLE001 — fault the batch, not the server
            logger.exception("batch of %d failed at launch", len(reqs))
            with self._lock:
                self.stats["errors"] += len(reqs)
            for r in reqs:
                r.error = e
                r.done.set()
            return

        def finish():
            import jax

            if device_tail:
                mels_host = np.asarray(jax.device_get(mels_dev[:b]))
                wavs = np.asarray(jax.device_get(y16[:b]))
                hop = wavs.shape[1] // mels_dev.shape[1]
                for i, r in enumerate(reqs):
                    r.mel = mels_host[i, : lens[i]]
                    r.wav = (wavs[i, : lens[i] * hop].astype(np.float32)
                             / 32767.0)
                    r.sr = voc.sampling_rate
            else:
                mels_host = np.asarray(jax.device_get(mels_dev[:b]))
                mels = [mels_host[i, : lens[i]] for i in range(b)]
                if voc is not None:
                    # host path (custom vocoders without the device tail,
                    # or dp-mesh conversions): one batched dispatch,
                    # edge-padded to the longest row
                    tmax = max(m.shape[0] for m in mels)
                    stacked = np.stack([
                        np.pad(m, ((0, tmax - m.shape[0]), (0, 0)),
                               mode="edge")
                        for m in mels
                    ])
                    wavs = voc.decode_batch(stacked)  # (B, tmax*hop)
                    hop = wavs.shape[1] // tmax
                    for r, mel, wav in zip(reqs, mels, wavs):
                        r.wav = wav[: mel.shape[0] * hop]
                        r.sr = voc.sampling_rate
                for r, mel in zip(reqs, mels):
                    r.mel = mel
            # span launch→fetch-done; overlapped batches can double-count
            # wall time, so stats["rtf"] is per-batch pipeline latency,
            # not device utilization
            compute = time.monotonic() - t0
            frame_sec = float(self._conv.config.get("shiftms", 10)) / 1000.0
            with self._lock:
                self.stats["requests"] += len(reqs)
                self.stats["batches"] += 1
                self.stats["compute_sec"] += compute
                self.stats["audio_sec"] += sum(lens[:b]) * frame_sec

        with self._lock:
            self._inflight += 1
        self._completions.put((reqs, finish))

    def _finish_loop(self):
        """Drain launched batches: blocking fetch + per-request result
        assignment.  A fetch/assign failure faults ITS batch only.  On
        shutdown, everything already launched still completes (the device
        work is real); only then does the thread exit.

        Exit requires the DISPATCHER to have exited too (not just _stop +
        empty queue): the dispatcher may still hold a collected window it
        has yet to launch, and exiting on the empty-queue snapshot alone
        would orphan that batch — callers would hang out their full
        submit timeout.  `_inflight` (incremented before the put) covers
        the launch→put gap the emptiness check can't see."""
        while True:
            with self._lock:
                drained = self._inflight == 0
            if (self._stop.is_set() and self._dispatcher_done and drained
                    and self._completions.empty()):
                break
            try:
                reqs, finish = self._completions.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                finish()
            except Exception as e:  # noqa: BLE001 — fault the batch only
                logger.exception("batch of %d failed at fetch", len(reqs))
                with self._lock:
                    self.stats["errors"] += len(reqs)
                for r in reqs:
                    r.error = e
            finally:
                # decrement BEFORE waking callers: a woken blocking client
                # resubmits immediately, and a stale busy=True would
                # busy-hold its window against an idle pipeline
                with self._lock:
                    self._inflight -= 1
                for r in reqs:
                    r.done.set()


# ---------------------------------------------------------------------------
# HTTP front
# ---------------------------------------------------------------------------

_SRC_KEYS = ("hubert", "score", "loud")
_REF_KEYS = _SRC_KEYS + ("logmel",)


class _PayloadTooLarge(ValueError):
    """POST body exceeds the server's max_body_bytes cap (HTTP 413)."""


class _UnreadBody(ValueError):
    """Request body cannot be consumed on this endpoint (HTTP 411)."""


def _ref_from_npz(z) -> dict:
    """The one place the ``ref_*`` feature layout is decoded (an optional
    reference feature added here reaches every endpoint)."""
    ref = {k: z[f"ref_{k}"] for k in _REF_KEYS}
    if "ref_f0_fluc" in z.files:
        ref["f0_fluc"] = z["ref_f0_fluc"]
    return ref


def _feats_from_npz(z):
    src = {k: z[f"src_{k}"] for k in _SRC_KEYS}
    if "src_f0_fluc" in z.files:  # SerenadeNew variant
        src["f0_fluc"] = z["src_f0_fluc"]
    ref = str(z["ref_name"]) if "ref_name" in z.files else _ref_from_npz(z)
    return src, ref


def _parse_npz(body: bytes):
    with np.load(io.BytesIO(body)) as z:
        return _feats_from_npz(z)


def _extract_or_raise(conv, wavs, srs, f0_ranges=None):
    """Batched on-device extraction (the int16-wire fast path shared with
    /convert_wav: PCM16 upload + in-program 24→16 kHz resample); a failed
    utterance raises instead of silently streaming nothing."""
    feats = conv.extract_from_wav_batch(wavs, srs, f0_ranges=f0_ranges)
    for f in feats:
        if f is None:
            raise ValueError("feature extraction failed for stream audio")
    return feats


class _RawSource:
    """A /convert_stream source that arrived as raw audio.  The handler
    streams it through the WINDOWED extraction path (Converter.
    convert_wav_stream) so time-to-first-audio pays for one window of
    extraction, not the whole utterance's; ``?windowed=0`` falls back to
    full extraction + convert_features_stream."""

    def __init__(self, wav, sr: int):
        self.wav = wav
        self.sr = int(sr)


def _parse_stream_body(body: bytes, query, batching, f0_table=None):
    """/convert_stream input: pre-extracted features (npz ``src_*``
    [+``ref_*``]), RAW AUDIO (RIFF bytes + ``?style=``, or npz with
    ``src_wav``/``sr`` and ``ref_name`` | ``ref_wav``/``ref_sr``), or raw
    source with a feature reference (``src_wav`` + ``ref_*`` arrays).
    Raw sources return a :class:`_RawSource` (extraction is deferred to
    the windowed streaming path); raw references extract up front (they
    are short).  Requires a ContentVec checkpoint for any raw audio.

    Returns ``(src, ref, f0_range)`` — the F0 range resolved from the
    body's npz keys (when present) or the query, so raw SOURCE
    extraction honors an npz-embedded range too, not just the ref.

    The source is deliberately NOT capped by ``max_request_seconds``:
    streaming converts in bounded windows outside the batching queue, so
    the giant-co-batched-bucket rationale for the cap does not apply —
    long-form sources are exactly what this endpoint is for.  The
    (short) ad-hoc reference extraction, which IS a one-shot device
    dispatch, keeps the cap."""
    conv = batching.converter

    def checked(wav, what):
        from serenade_tpu.features import validate_waveform

        return validate_waveform(wav, what)

    def ref_capped(wav, sr, what):
        wav = checked(wav, what)
        cap = getattr(batching, "max_request_seconds", None)
        if cap is not None and len(wav) > cap * sr:
            raise ValueError(
                f"{what} is {len(wav) / sr:.0f}s, over the server's "
                f"per-request cap of {cap:.0f}s (max_request_seconds)")
        return wav

    if body[:4] == b"RIFF":
        from serenade_tpu.utils.audio import read_wav

        src_wav, sr = read_wav(io.BytesIO(body))
        style = query.get("style", [""])[0]
        if not style:
            raise ValueError("RIFF body needs ?style=<registered name>")
        return (_RawSource(checked(src_wav, "src_wav"), sr),
                batching.packed_reference(style),
                _f0_range_from(query, f0_table=f0_table))
    with np.load(io.BytesIO(body)) as z:
        f0_range = _f0_range_from(query, files=z, f0_table=f0_table)
        if "src_wav" not in z.files:
            src, ref = _feats_from_npz(z)
            # dims must be right, but streaming has no co-batched
            # neighbors to protect — no duration cap here
            batching._validate_feats(src, "src", with_mel=False,
                                     cap_duration=False)
            if isinstance(ref, str):
                ref = batching.packed_reference(ref)
            return src, ref, f0_range
        src_wav, sr = z["src_wav"], int(z["sr"])
        if "ref_name" in z.files:
            ref = batching.packed_reference(str(z["ref_name"]))
        elif "ref_wav" in z.files:
            ref = _extract_or_raise(
                conv,
                [ref_capped(z["ref_wav"], int(z["ref_sr"]), "ref_wav")],
                [int(z["ref_sr"])], f0_ranges=[f0_range])[0]
        else:  # raw source, pre-extracted reference features
            ref = _ref_from_npz(z)
    return _RawSource(checked(src_wav, "src_wav"), sr), ref, f0_range


def _parse_ref_npz(body: bytes):
    with np.load(io.BytesIO(body)) as z:
        return _ref_from_npz(z)


def _encode_feats(prefix: str, feats, keys) -> dict:
    arrays = {f"{prefix}_{k}": np.asarray(feats[k]) for k in keys}
    if "f0_fluc" in feats:
        arrays[f"{prefix}_f0_fluc"] = np.asarray(feats["f0_fluc"])
    return arrays


def encode_request(src_feats, ref) -> bytes:
    """Client-side helper: pack the POST body.  ``ref`` is a feature dict
    or a registered style name."""
    buf = io.BytesIO()
    arrays = _encode_feats("src", src_feats, _SRC_KEYS)
    if isinstance(ref, str):
        arrays["ref_name"] = np.asarray(ref)
    else:
        arrays.update(_encode_feats("ref", ref, _REF_KEYS))
    np.savez(buf, **arrays)
    return buf.getvalue()


def encode_reference(ref_feats) -> bytes:
    """Client-side helper: body for POST /register_reference?name=<style>."""
    buf = io.BytesIO()
    np.savez(buf, **_encode_feats("ref", ref_feats, _REF_KEYS))
    return buf.getvalue()


def decode_response(body: bytes):
    """Client-side helper: unpack a /convert_features response."""
    with np.load(io.BytesIO(body)) as z:
        mel = z["mel"]
        wav = z["wav"] if "wav" in z.files else None
        sr = int(z["sr"]) if "sr" in z.files else None
    return mel, wav, sr


def encode_wav_request(src_wav, sr: int, ref, f0_range=None) -> bytes:
    """Client-side helper: npz body for POST /convert_wav.  ``ref`` is a
    registered style name or a (ref_wav, ref_sr) tuple.  (Plain RIFF wav
    bytes + ``?style=<name>`` work too — this helper is for the ad-hoc
    reference case or when the query string is inconvenient.)
    ``f0_range=(minf0, maxf0)`` narrows the extraction F0 search to the
    singer's range (the ``?f0_min=&f0_max=`` query params do the same)."""
    arrays = {"src_wav": np.asarray(src_wav, np.float32),
              "sr": np.int64(sr)}
    if isinstance(ref, str):
        arrays["ref_name"] = np.asarray(ref)
    else:
        ref_wav, ref_sr = ref
        arrays["ref_wav"] = np.asarray(ref_wav, np.float32)
        arrays["ref_sr"] = np.int64(ref_sr)
    if f0_range is not None:
        arrays["f0_min"] = np.float64(f0_range[0])
        arrays["f0_max"] = np.float64(f0_range[1])
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _f0_range_from(query, files=None, f0_table=None) -> Optional[tuple]:
    """(minf0, maxf0) from ``?f0_min=&f0_max=`` query params or npz keys
    (npz wins when both present in ``files``), else from
    ``?voice_type=<key>`` resolved through the server's ``--f0-table``
    (the reference's conf/f0.yaml voice-type ranges); None when
    unspecified."""
    if files is not None and ("f0_min" in files.files
                              or "f0_max" in files.files):
        if not ("f0_min" in files.files and "f0_max" in files.files):
            raise ValueError("f0_min and f0_max must be given together")
        return check_f0_range((float(files["f0_min"]),
                               float(files["f0_max"])))
    lo = query.get("f0_min", [None])[0]
    hi = query.get("f0_max", [None])[0]
    if lo is None and hi is None:
        vt = query.get("voice_type", [None])[0]
        if vt is None:
            return None
        if not f0_table or vt not in f0_table:
            raise ValueError(
                f"unknown voice_type {vt!r}; the server's --f0-table "
                f"knows: {sorted(f0_table or {})}")
        row = f0_table[vt]
        return check_f0_range((float(row["minf0"]), float(row["maxf0"])))
    if lo is None or hi is None:
        raise ValueError("f0_min and f0_max must be given together")
    return check_f0_range((float(lo), float(hi)))


def warmup_server(batching, shapes, raw_audio: bool = False,
                  seed: int = 0) -> None:
    """Drive synthetic requests through the dispatcher so the padded
    dispatch programs compile (and load onto the device) BEFORE real
    traffic — the first request of a new (bucket, batch) shape otherwise
    pays the whole compile (minutes for the CFM scan on a cold cache;
    see docs/PROFILING.md).

    ``shapes``: iterable of ``(src_frames, ref_frames, concurrency)``
    — concurrency B submits B requests at once so the dispatcher packs a
    real B-batch window (warm every batch size you expect, not just 1).
    ``raw_audio=True`` warms the /convert_wav extraction chain instead
    (requires the Converter's contentvec).  Failures raise: a warmup
    that cannot convert means serving could not either.

    The stats counters are restored to their pre-warmup values on
    success: warmup batches include first-compile time against seconds
    of synthetic audio, which would otherwise wreck the /healthz and
    /metrics ``rtf`` right when operators check a fresh deploy.  Call
    BEFORE taking traffic (the serve CLI does) — the restore is not
    safe against concurrent real requests.
    """
    import threading
    import time as _time

    conv = batching.converter
    stats_before = dict(batching.stats)
    rng = np.random.default_rng(seed)
    content_dim = np.asarray(conv.scaler["hubert"].mean_).shape[0]
    n_mels = np.asarray(conv.scaler["logmel"].mean_).shape[0]

    def feats(t: int, with_mel: bool):
        f = {"hubert": rng.normal(size=(t, content_dim)).astype(np.float32),
             "score": np.full((t, 1), 5.0, np.float32),
             "loud": (rng.normal(size=(t, 1)).astype(np.float32) - 30.0)}
        if with_mel:
            f["logmel"] = rng.normal(size=(t, n_mels)).astype(np.float32)
        if conv.variant_new:
            f["f0_fluc"] = np.zeros((t, 1), np.float32)
        return f

    sr = int(conv.config.get("sampling_rate", 24000))
    hop = int(conv.config.get("hop_size", 240))

    def wav(t: int, f0: float):
        n = t * hop
        x = np.arange(n, dtype=np.float32) / sr
        return (0.2 * np.sin(2 * np.pi * f0 * x)).astype(np.float32)

    for ts, tr, b in shapes:
        t0 = _time.monotonic()
        errs = []

        def one(i):
            try:
                if raw_audio:
                    batching.convert_wav(wav(ts, 200.0 + 7 * i), sr,
                                         (wav(tr, 300.0 + 5 * i), sr))
                else:
                    batching.convert(feats(ts, False), feats(tr, True))
            except Exception as e:  # noqa: BLE001 — re-raised below
                errs.append(e)

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(b)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if errs:
            raise RuntimeError(
                f"warmup failed at shape ({ts}, {tr}, b={b})") from errs[0]
        logger.info("warmup %s (%d, %d) x%d: %.1fs",
                    "raw" if raw_audio else "features", ts, tr, b,
                    _time.monotonic() - t0)
    with batching._lock:
        batching.stats.update(stats_before)


def _frame_block(arrays: dict) -> bytes:
    """Length-prefixed npz block for the /convert_stream wire format."""
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    payload = buf.getvalue()
    return len(payload).to_bytes(4, "big") + payload


def iter_stream_blocks(read, strict: bool = True):
    """Client-side helper: parse a /convert_stream body (a callable or
    file-like ``read(n)``) into dicts of arrays, in order.

    The server ends every stream with a terminal marker block —
    ``{done: 1}`` on success or ``{error: <msg>}`` after a mid-stream
    failure — so truncated output is distinguishable from a complete
    conversion.  The marker is consumed, not yielded: on ``error`` this
    raises RuntimeError; with ``strict`` (default) a stream that ends
    without any marker (connection cut) also raises."""
    read = read.read if hasattr(read, "read") else read

    def read_exact(n):
        out = b""
        while len(out) < n:
            chunk = read(n - len(out))
            if not chunk:
                return out
            out += chunk
        return out

    while True:
        head = read_exact(4)
        if len(head) < 4:
            if strict:
                raise RuntimeError(
                    "stream ended without a terminal marker (truncated)")
            return
        size = int.from_bytes(head, "big")
        body = read_exact(size)
        if len(body) < size:
            if strict:
                raise RuntimeError(
                    "stream ended mid-block (truncated)")
            return
        with np.load(io.BytesIO(body)) as z:
            blk = {k: z[k] for k in z.files}
        if "error" in blk:
            read(1)  # drain EOF so the connection stays reusable
            raise RuntimeError(f"server stream failed: {blk['error']}")
        if "done" in blk:
            # drain the end-of-stream so file-likes (http.client chunked
            # responses) see EOF and the connection can be reused
            read(1)
            return
        yield blk


def make_server(batching: BatchingConverter, host: str = "127.0.0.1",
                port: int = 8571, max_body_bytes: int = 256 << 20,
                f0_table=None):
    """Build (not start) a ThreadingHTTPServer around a BatchingConverter.

    ``max_body_bytes`` caps every POST body (413 beyond it) — feature
    payloads are a few MB, so the default 256 MB only stops hostile or
    runaway uploads from exhausting host memory on a reachable port."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (used by /convert_stream) is only defined for
        # HTTP/1.1; default BaseHTTPRequestHandler answers as HTTP/1.0 and
        # RFC-compliant clients/proxies would not de-chunk
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through logging
            logger.debug("http: " + fmt, *args)

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> bytes:
            if self.headers.get("Content-Length") is None and (
                    "chunked" in (self.headers.get(
                        "Transfer-Encoding") or "").lower()):
                # only /convert_stream_live consumes chunked bodies; on
                # any other endpoint the body would stay on the socket
                # and desync keep-alive
                raise _UnreadBody("endpoint requires Content-Length")
            n = int(self.headers.get("Content-Length", "0"))
            if n > max_body_bytes:
                raise _PayloadTooLarge(
                    f"body of {n} bytes exceeds the server cap of "
                    f"{max_body_bytes}")
            return self.rfile.read(n)

        def _fault(self, e: Exception):
            code = (413 if isinstance(e, _PayloadTooLarge)
                    else 411 if isinstance(e, _UnreadBody) else 400)
            if code != 400:
                # the body was never read off the socket (oversized or
                # chunked-without-length); under HTTP/1.1 keep-alive the
                # next request parse would start mid-body and desync
                # every pipelined request after it
                self.close_connection = True
            return self._send(code, json.dumps({"error": str(e)}).encode(),
                              "application/json")

        def do_GET(self):
            if self.path == "/metrics":
                # Prometheus text exposition of the same counters
                # /healthz reports as JSON — scrapeable without adapters
                s = dict(batching.stats)
                rtf = (s["compute_sec"] / s["audio_sec"]
                       if s["audio_sec"] else 0.0)
                lines = []
                for name, kind, val, help_ in (
                    ("requests_total", "counter", s["requests"],
                     "Completed conversion requests."),
                    ("batches_total", "counter", s["batches"],
                     "Device dispatch windows executed."),
                    ("errors_total", "counter", s["errors"],
                     "Requests that faulted."),
                    ("audio_seconds_total", "counter", s["audio_sec"],
                     "Audio-seconds converted."),
                    ("compute_seconds_total", "counter", s["compute_sec"],
                     "Device compute-seconds spent."),
                    ("rtf", "gauge", rtf,
                     "Server-side real-time factor (compute/audio)."),
                    ("registered_references", "gauge",
                     len(batching.reference_names()),
                     "Device-resident registered styles."),
                ):
                    lines.append(f"# HELP serenade_{name} {help_}")
                    lines.append(f"# TYPE serenade_{name} {kind}")
                    lines.append(f"serenade_{name} {val}")
                return self._send(200, ("\n".join(lines) + "\n").encode(),
                                  "text/plain; version=0.0.4")
            if self.path != "/healthz":
                return self._send(404, b"{}", "application/json")
            stats = dict(batching.stats)
            stats["rtf"] = (stats["compute_sec"] / stats["audio_sec"]
                            if stats["audio_sec"] else None)
            stats["references"] = batching.reference_names()
            self._send(200, json.dumps({"ok": True, **stats}).encode(),
                       "application/json")

        def _convert_stream(self, query):
            """Chunked-transfer stream of length-prefixed npz blocks
            ({start, mel[, wav, sr]}) as long-form regions finalize; parse
            with ``iter_stream_blocks``.  Bypasses the batching queue —
            this path optimizes time-to-first-audio, not throughput.
            Optional query params: chunk_frames, overlap_frames.  Accepts
            feature npz, RIFF + ?style=, or raw-audio npz bodies
            (``_parse_stream_body``)."""
            try:
                # f0_range comes from the BODY's npz keys when present,
                # else the query — so a range shipped with the audio
                # applies to the source extraction, not just the ref
                src, ref, f0_range = _parse_stream_body(
                    self._read_body(), query, batching,
                    f0_table=f0_table)
                conv = batching.converter
                chunk_frames = int(query.get("chunk_frames", ["2048"])[0])
                overlap_frames = int(
                    query.get("overlap_frames", ["256"])[0])
                windowed = query.get("windowed", ["1"])[0] not in ("0",
                                                                   "false")
                if isinstance(src, _RawSource) and windowed:
                    gen = conv.convert_wav_stream(
                        src.wav, src.sr, ref,
                        chunk_frames=chunk_frames,
                        overlap_frames=overlap_frames,
                        first_chunk_frames=int(
                            query.get("first_chunk_frames", ["512"])[0]),
                        extract_ctx_frames=int(
                            query.get("extract_ctx_frames", ["256"])[0]),
                        f0_range=f0_range,
                    )
                else:
                    if isinstance(src, _RawSource):
                        src = _extract_or_raise(
                            conv, [src.wav], [src.sr],
                            f0_ranges=[f0_range])[0]
                    gen = conv.convert_features_stream(
                        src, ref, chunk_frames=chunk_frames,
                        overlap_frames=overlap_frames,
                    )
                sr = conv.output_sample_rate
                # pull the FIRST segment before committing to 200: the
                # generator is lazy, so conversion errors (bad feature
                # dims etc.) surface here and become a real 400 instead
                # of an empty-but-"successful" stream
                first = next(gen, None)
            except Exception as e:  # noqa: BLE001 — per-request fault
                return self._fault(e)
            self._emit_stream(gen, first, sr)

        def _emit_stream(self, gen, first, sr, close_on_fault=False):
            """200 + chunked response of length-prefixed npz blocks with
            the terminal {done}/{error} marker contract (see
            ``iter_stream_blocks``)."""
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(b: bytes):
                self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")

            def emit(seg):
                start, mel_seg, wav_seg = seg
                arrays = {"start": np.int64(start), "mel": mel_seg}
                if wav_seg is not None:
                    arrays["wav"] = wav_seg
                    arrays["sr"] = np.int64(sr)
                chunk(_frame_block(arrays))

            # every stream ends with a terminal marker block before the
            # chunked terminator: {done: 1} on success, {error: msg} on a
            # mid-stream failure — otherwise a truncated conversion would
            # parse as a complete, successful stream
            try:
                if first is not None:
                    emit(first)
                for seg in gen:
                    emit(seg)
                chunk(_frame_block({"done": np.int64(1)}))
            except Exception as e:  # noqa: BLE001 — mid-stream fault
                logger.exception("stream conversion failed mid-flight")
                if close_on_fault:
                    # the request body may be half-read: a reused
                    # connection would desync on the next request
                    self.close_connection = True
                try:
                    chunk(_frame_block({"error": np.asarray(str(e))}))
                except Exception:  # noqa: BLE001 — socket already gone
                    pass
            finally:
                self.wfile.write(b"0\r\n\r\n")

        def _iter_chunked_body(self):
            """Incrementally decode a Transfer-Encoding: chunked request
            body (BaseHTTPRequestHandler doesn't) — the live endpoint
            consumes pieces as the client uploads them."""
            total = 0
            while True:
                line = self.rfile.readline(1024)
                if line == b"":
                    # EOF between chunks is a DISCONNECT, not end-of-body:
                    # treating it as the terminal 0-chunk would convert a
                    # truncated upload 'successfully' and end the stream
                    # with the {done: 1} marker
                    raise ValueError("chunked upload disconnected "
                                     "mid-stream")
                if not line.endswith(b"\n"):
                    # a >1 KiB size line (chunk extensions) would leave
                    # its remainder to be read as payload and desync
                    raise ValueError("oversized chunk-size line")
                size = int(line.split(b";")[0].strip() or b"0", 16)
                if size == 0:
                    while True:  # drain optional trailers up to blank
                        t = self.rfile.readline(1024)
                        if t in (b"\r\n", b"\n", b""):
                            return
                total += size
                if total > max_body_bytes:
                    raise _PayloadTooLarge(
                        f"chunked body exceeds the server cap of "
                        f"{max_body_bytes}")
                data = b""
                while len(data) < size:
                    got = self.rfile.read(size - len(data))
                    if not got:
                        raise ValueError("truncated chunked body")
                    data += got
                self.rfile.read(2)  # chunk-terminating CRLF
                yield data

        def _convert_stream_live(self, query):
            """DUPLEX live conversion: raw PCM16 mono audio uploads as a
            chunked request body and converted segments stream back on
            the SAME connection while the source is still arriving —
            live-microphone style conversion (the offline reference has
            no analogue).  Query: ``style`` (registered, required),
            ``sr`` (must equal the model rate), chunk_frames /
            overlap_frames / extract_ctx_frames (defaults 64/16/32 —
            the measured +0.61 s sub-second rung; docs/SERVING.md
            ladder).  A Content-Length
            body is accepted as a single piece.  Response: the
            /convert_stream block wire."""
            try:
                conv = batching.converter
                style = query.get("style", [""])[0]
                if not style:
                    raise ValueError(
                        "live stream needs ?style=<registered name>")
                ref = batching.packed_reference(style)
                sr = int(query.get("sr", ["24000"])[0])
                te = (self.headers.get("Transfer-Encoding") or "").lower()
                byte_iter = (self._iter_chunked_body() if "chunked" in te
                             else iter([self._read_body()]))

                def audio_iter():
                    carry = b""
                    for piece in byte_iter:
                        data = carry + piece
                        cut = len(data) - (len(data) % 2)
                        carry = data[cut:]
                        if cut:
                            yield (np.frombuffer(data[:cut], "<i2")
                                   .astype(np.float32) / 32768.0)
                    if carry:
                        raise ValueError(
                            "odd trailing byte in PCM16 live body")

                # defaults 64/32/16 = the measured +0.61 s sub-second
                # rung (docs/SERVING.md lag/quality ladder: every rung's
                # MCD-vs-offline is below the CFM stochastic floor)
                gen = conv.convert_wav_stream_live(
                    audio_iter(), sr, ref,
                    chunk_frames=int(
                        query.get("chunk_frames", ["64"])[0]),
                    overlap_frames=int(
                        query.get("overlap_frames", ["16"])[0]),
                    extract_ctx_frames=int(
                        query.get("extract_ctx_frames", ["32"])[0]),
                    f0_range=_f0_range_from(query, f0_table=f0_table),
                )
                out_sr = conv.output_sample_rate
                first = next(gen, None)
            except Exception as e:  # noqa: BLE001 — per-request fault
                # the body may be partially read: never reuse the socket
                self.close_connection = True
                return self._fault(e)
            self._emit_stream(gen, first, out_sr, close_on_fault=True)

        def _convert_wav(self, query):
            """Raw audio in, audio out: the transfer-light serving path
            (a 24 kHz waveform is ~48x smaller on the wire than the 768-d
            content features /convert_features uploads).  Body is either
            RIFF wav bytes + ``?style=<registered>`` or an npz from
            ``encode_wav_request`` (src_wav/sr + ref_name | ref_wav/
            ref_sr).  Responds with RIFF wav bytes when a vocoder is
            loaded, else an npz with the mel."""
            try:
                body = self._read_body()
                if body[:4] == b"RIFF":
                    from serenade_tpu.utils.audio import read_wav

                    src_wav, sr = read_wav(io.BytesIO(body))
                    style = query.get("style", [""])[0]
                    if not style:
                        raise ValueError(
                            "RIFF body needs ?style=<registered name>")
                    ref = style
                    f0_range = _f0_range_from(query, f0_table=f0_table)
                else:
                    with np.load(io.BytesIO(body)) as z:
                        src_wav = z["src_wav"]
                        sr = int(z["sr"])
                        if "ref_name" in z.files:
                            ref = str(z["ref_name"])
                        else:
                            ref = (z["ref_wav"], int(z["ref_sr"]))
                        f0_range = _f0_range_from(query, files=z,
                                              f0_table=f0_table)
                mel, wav, out_sr = batching.convert_wav(src_wav, sr, ref,
                                                        f0_range=f0_range)
                if wav is not None:
                    from serenade_tpu.utils.audio import write_wav

                    buf = io.BytesIO()
                    write_wav(buf, wav, out_sr)
                    return self._send(200, buf.getvalue(), "audio/wav")
                buf = io.BytesIO()
                np.savez(buf, mel=mel)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # noqa: BLE001 — per-request fault
                self._fault(e)

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            parsed = urlparse(self.path)
            if parsed.path == "/register_reference":
                try:
                    name = parse_qs(parsed.query).get("name", [""])[0]
                    if not name:
                        raise ValueError("missing ?name=<style>")
                    batching.register_reference(
                        name, _parse_ref_npz(self._read_body()))
                    return self._send(
                        200, json.dumps({"ok": True, "name": name}).encode(),
                        "application/json")
                except Exception as e:  # noqa: BLE001 — per-request fault
                    return self._fault(e)
            if parsed.path == "/convert_stream":
                return self._convert_stream(parse_qs(parsed.query))
            if parsed.path == "/convert_stream_live":
                return self._convert_stream_live(parse_qs(parsed.query))
            if parsed.path == "/convert_wav":
                return self._convert_wav(parse_qs(parsed.query))
            if parsed.path != "/convert_features":
                return self._send(404, b"{}", "application/json")
            try:
                src, ref = _parse_npz(self._read_body())
                mel, wav, sr = batching.convert(src, ref)
                buf = io.BytesIO()
                out = {"mel": mel}
                if wav is not None:
                    out["wav"], out["sr"] = wav, np.int64(sr)
                np.savez(buf, **out)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # noqa: BLE001 — per-request fault
                self._fault(e)

    return ThreadingHTTPServer((host, port), Handler)
