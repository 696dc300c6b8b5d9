"""High-level conversion API: one object, one call per conversion.

The serving-side face of the framework (the reference's equivalent flow is
spread across ssc_decode.py's main loop).  Loads a trained experiment
directory (config.yml + latest checkpoint + scaler + optional vocoder /
ContentVec checkpoints) and exposes:

* ``convert_features(src_feats, ref_feats)`` — dicts of (already extracted)
  feature arrays → mel (+ waveform when a vocoder is loaded);
* ``convert_wav(src_wav, ref_wav, sr)`` — raw audio end to end (requires a
  ContentVec checkpoint for content features).

All compute is jitted and bucketed: repeated calls with similar lengths
reuse compiled programs.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class Converter:
    def __init__(
        self,
        expdir: str,
        stats: str,
        checkpoint: Optional[str] = None,
        contentvec_ckpt: Optional[str] = None,
        n_timesteps: Optional[int] = None,
        solver: Optional[str] = None,
        temperature: float = 0.667,
        seed: int = 0,
        data_mesh: Optional[int] = None,
        quantize: Optional[str] = None,
    ):
        """``data_mesh=N`` shards batched conversions over an N-way 'data'
        mesh (params replicated) — serving/decode on a pod slice.  Batches
        are padded up to a multiple of N; single-request paths are
        unaffected.

        ``n_timesteps``/``solver`` default to the checkpoint config's own
        recommendation (``inference_n_timesteps``/``inference_solver``,
        written by ``serenade-distill``) like the decode CLI, falling back
        to the reference sampler (10 Euler steps) — so serving a distilled
        checkpoint runs its few-step sampler without extra flags.

        ``quantize="int8"`` stores the model weights int8 per-channel
        (serenade_tpu.quantize): ~4x smaller device-resident params and
        exported artifacts, RTF-neutral at conversion shapes (the
        dequant hoists out of the ODE scan); quality bound quantified in
        tests/test_quantize.py.

        ``quantize="int8_compute"`` additionally RUNS the estimator's 2-D
        matmuls in int8: activations quantize dynamically per row and the
        MXU contracts int8×int8 (quantize.int8_dot via QDense) — the
        weights stay int8 in HBM inside the CFM scan, halving the weight
        traffic that dominates batch-1 decode (nothing to hoist, unlike
        the weight-only mode).  Convs/norms/GST stay float."""
        import jax
        import joblib

        import serenade_tpu.models  # noqa: F401 (register)
        from serenade_tpu.checkpoint import (
            find_latest_checkpoint, restore_params_only,
        )
        from serenade_tpu.config import load_config, resolve

        self._jax = jax
        self.config = load_config(os.path.join(expdir, "config.yml"))
        ckpt = checkpoint or find_latest_checkpoint(expdir)
        if ckpt is None:
            raise FileNotFoundError(f"no checkpoint under {expdir}")
        model_cls = resolve("model", self.config["model_type"])
        self.model = model_cls(**self.config.get("model_params", {}))
        # the modded variant threads the f0-fluctuation feature through
        # inference (reference serenade_new.py:198-224); declared as a
        # class capability, not inferred from the registry name
        self.variant_new = bool(getattr(model_cls, "uses_f0_fluc", False))
        self.params = restore_params_only(ckpt)
        if quantize is not None:
            if quantize == "int8":
                from serenade_tpu.quantize import quantize_tree

                self.params = jax.jit(quantize_tree)(self.params)
            elif quantize == "int8_compute":
                from serenade_tpu.quantize import quantize_dense_tree

                self.params = jax.jit(quantize_dense_tree)(self.params)
            else:
                raise ValueError(f"unknown quantize mode {quantize!r} "
                                 "(supported: 'int8', 'int8_compute')")
        self.quantize = quantize
        self.scaler = joblib.load(stats)
        if n_timesteps is None:
            n_timesteps = int(self.config.get("inference_n_timesteps", 10))
        if solver is None:
            solver = str(self.config.get("inference_solver", "euler"))
        self.n_timesteps = n_timesteps
        self.solver = solver
        self.temperature = temperature
        self._key = jax.random.key(seed)
        # serving runs conversions from multiple threads (dispatcher +
        # streaming handler threads); the PRNG chain must advance atomically
        import threading

        self._key_lock = threading.Lock()

        self.vocoder = None
        voc = self.config.get("vocoder") or {}
        from serenade_tpu.vocoder.vocoder import vocoder_available

        voc_ok = vocoder_available(voc)
        if voc.get("checkpoint") and not voc_ok:
            # a typo'd path silently degrading the server to mel-only
            # output breaks clients downstream with nothing in the logs
            logger.warning(
                "configured vocoder checkpoint %s does not exist; "
                "conversions will return mel only", voc["checkpoint"])
        if voc_ok:
            from serenade_tpu.vocoder import Vocoder

            self.vocoder = Vocoder(
                voc.get("checkpoint") or "", voc["config"], voc["stats"],
                trg_stats={"mean": self.scaler["logmel"].mean_,
                           "scale": self.scaler["logmel"].scale_},
            )

        self._content_fn = None
        if contentvec_ckpt:
            from serenade_tpu.bin.preprocess import make_content_fn

            self._content_fn = make_content_fn(contentvec_ckpt)
        self._gst_fn = None  # lazy jit (style_embedding)

        self._infer = jax.jit(self._infer_impl)

        self.mesh = None
        if data_mesh and data_mesh > 1:
            from serenade_tpu.parallel import make_mesh, replicated

            self.mesh = make_mesh(data=data_mesh, model=1)
            self.params = jax.device_put(self.params, replicated(self.mesh))

    def _next_key(self):
        import jax

        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    @property
    def output_sample_rate(self) -> Optional[int]:
        """Waveform sample rate of vocoded outputs (None if no vocoder)."""
        return self.vocoder.sampling_rate if self.vocoder else None

    # ------------------------------------------------------------------

    def _infer_impl(self, params, src, ref, key):
        from serenade_tpu.quantize import dequantize_tree

        # identity on unquantized trees; with quantize="int8" the weights
        # cross HBM as int8 and the scale multiply fuses into consumers.
        # int8_compute keeps its QTensor kernels IN the tree: QDense
        # consumes them directly as int8 matmul operands
        if self.quantize != "int8_compute":
            params = dequantize_tree(params)
        args = [src["x"], src["lengths"], src["midi"], src["loud"]]
        if self.variant_new:
            args.append(src["f0_fluc"])
        args += [ref["x"], ref["lengths"], ref["logmel"], ref["midi"],
                 ref["loud"]]
        if self.variant_new:
            args.append(ref["f0_fluc"])
        return self.model.apply(
            params, *args, rng=key, n_timesteps=self.n_timesteps,
            temperature=self.temperature, solver=self.solver,
            method="inference",
        )

    def _normalize_src(self, feats: Dict[str, np.ndarray]):
        s = self.scaler
        out = {
            "hubert": (feats["hubert"] - s["hubert"].mean_) / s["hubert"].scale_,
            "score": (feats["score"] - s["score"].data_min_)
            / (s["score"].data_max_ - s["score"].data_min_),
            "loud": (feats["loud"] - s["loud"].data_min_)
            / (s["loud"].data_max_ - s["loud"].data_min_),
        }
        if self.variant_new:
            out["f0_fluc"] = np.asarray(feats["f0_fluc"])  # unscaled, like
            # the reference dataset (audio_mel_dataset.py:188,220)
        return out

    def _normalize_ref(self, feats: Dict[str, np.ndarray]):
        out = self._normalize_src(feats)
        s = self.scaler
        out["logmel"] = (
            feats["logmel"] - s["logmel"].mean_
        ) / s["logmel"].scale_
        return out

    @staticmethod
    def _pack(feats: Dict[str, np.ndarray], with_mel: bool):
        import jax.numpy as jnp

        from serenade_tpu.collaters.ssc import bucket_length, pad_to

        t = feats["hubert"].shape[0]
        T = bucket_length(t)

        def pad(a):
            import jax

            if isinstance(a, jax.Array):
                # device-resident stream (e.g. ContentVec output): pad and
                # batch ON DEVICE — np.asarray here would fetch the whole
                # feature block to host just to re-upload it
                a = a.astype(jnp.float32)
                if a.ndim == 1:
                    a = a[:, None]
                if a.shape[0] >= T:
                    return a[None, :T]
                return jnp.pad(a, ((0, T - a.shape[0]), (0, 0)))[None]
            a = np.asarray(a, np.float32)
            if a.ndim == 1:
                a = a[:, None]
            return jnp.asarray(pad_to(a, T))[None]

        out = {
            "x": pad(feats["hubert"]),
            "lengths": jnp.asarray([t]),
            "midi": pad(feats["score"]),
            "loud": pad(feats["loud"]),
        }
        if with_mel:
            out["logmel"] = pad(feats["logmel"])
        if "f0_fluc" in feats:
            out["f0_fluc"] = pad(feats["f0_fluc"])
        return out, t

    # ------------------------------------------------------------------

    def convert_features(
        self, src_feats: Dict[str, np.ndarray],
        ref_feats: Dict[str, np.ndarray],
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[int]]:
        """Normalized conversion from extracted features.

        src_feats needs hubert/score/loud; ref_feats additionally logmel
        (all un-normalized, as stored in the h5 dumps).

        Returns (mel, wav or None, sr or None).
        """
        import jax

        src, t_src = self._pack(self._normalize_src(src_feats), False)
        ref, _ = self._pack(self._normalize_ref(ref_feats), True)
        sub = self._next_key()
        mel = np.asarray(jax.device_get(
            self._infer(self.params, src, ref, sub)
        ))[0, :t_src]
        if self.vocoder is not None:
            wav, sr = self.vocoder.decode(mel)
            return mel, wav, sr
        return mel, None, None

    def convert_features_long(
        self, src_feats: Dict[str, np.ndarray],
        ref_feats: Dict[str, np.ndarray],
        chunk_frames: int = 2048, overlap_frames: int = 256,
    ):
        """Long-form conversion: overlapped chunks crossfaded into one mel
        (sources may exceed the 3000-frame training cap).  Returns
        (mel, wav or None, sr or None)."""
        from serenade_tpu.ops.longform import convert_in_chunks

        frame_feats = self._source_frame_feats(src_feats)
        mel = convert_in_chunks(frame_feats,
                                self._chunk_converter(ref_feats),
                                chunk_frames=chunk_frames,
                                overlap_frames=overlap_frames)
        if self.vocoder is not None:
            wav, sr = self.vocoder.decode(mel)
            return mel, wav, sr
        return mel, None, None

    def convert_features_stream(
        self, src_feats: Dict[str, np.ndarray],
        ref_feats: Dict[str, np.ndarray],
        chunk_frames: int = 2048, overlap_frames: int = 256,
        vocoder_context_frames: int = 32,
    ):
        """Streaming long-form conversion: yields
        ``(start_frame, mel_segment, wav_segment|None)`` as each region
        finalizes — first audio after ONE chunk, not the whole utterance.
        The waveform sample rate is :attr:`output_sample_rate` (known
        before iteration, so headers can be written up front).

        Waveform segments are vocoded with ``vocoder_context_frames`` of
        already-final left context (re-synthesized and trimmed) so the
        HiFiGAN receptive field sees real history at segment joins.
        """
        from serenade_tpu.ops.longform import convert_in_chunks_stream

        frame_feats = self._source_frame_feats(src_feats)
        yield from self._vocode_segments(
            convert_in_chunks_stream(
                frame_feats, self._chunk_converter(ref_feats),
                chunk_frames=chunk_frames, overlap_frames=overlap_frames),
            vocoder_context_frames)

    def convert_wav_stream(
        self, src_wav: np.ndarray, sr: int,
        ref_feats: Dict[str, np.ndarray],
        chunk_frames: int = 2048, overlap_frames: int = 256,
        first_chunk_frames: int = 512, extract_ctx_frames: int = 256,
        vocoder_context_frames: int = 32,
        f0_range: Optional[Tuple[float, float]] = None,
    ):
        """Streaming long-form conversion FROM RAW AUDIO with WINDOWED
        extraction: yields ``(start_frame, mel_segment, wav_segment|None)``
        like :meth:`convert_features_stream`, but feature extraction
        (mel/loudness/F0 + ContentVec) runs per conversion chunk instead
        of over the whole source first — time-to-first-audio pays for one
        context-padded window (~chunk seconds) of extraction, not the
        full utterance's.  The next window extracts while the current
        chunk converts (one-ahead prefetch), and the chunk schedule ramps
        from ``first_chunk_frames`` up to ``chunk_frames`` so the first
        audio is small AND fast while steady state keeps big dispatches.

        Requires a ContentVec checkpoint (like :meth:`convert_wav`).
        Windowed extraction is measured against full-utterance extraction
        in tests/test_stream_windowed.py (signal features match in span
        interiors; ContentVec windows differ at its global-attention
        boundary, blended away by the chunk crossfade).
        """
        if self._content_fn is None:
            raise RuntimeError(
                "raw-audio conversion requires contentvec_ckpt; use "
                "convert_features_stream with precomputed features "
                "otherwise"
            )
        from concurrent.futures import ThreadPoolExecutor

        from serenade_tpu.features import (
            FeatureConfig, _prepare_audio, extract_stream_window,
            stream_total_frames,
        )
        from serenade_tpu.ops.longform import (
            split_chunks_ramp, stitch_mel_stream,
        )

        fc = FeatureConfig.from_dict(self.config)
        audio = _prepare_audio("stream_src", src_wav, sr, fc)
        n = stream_total_frames(len(audio), fc)
        spans = split_chunks_ramp(n, chunk_frames, overlap_frames,
                                  first_chunk_frames)
        convert_chunk = self._chunk_converter(ref_feats)
        minf0, maxf0 = f0_range or (70.0, 1100.0)  # f0_range_for defaults

        def extract(span):
            return extract_stream_window(
                audio, span, fc, minf0, maxf0,
                content_fn=self._content_fn,
                ctx_frames=extract_ctx_frames,
                with_f0_fluc=self.variant_new,
            )

        def mels():
            # one-ahead prefetch: window i+1's extraction dispatches
            # while chunk i converts (and its mel fetch blocks)
            with ThreadPoolExecutor(max_workers=1) as ex:
                fut = ex.submit(extract, spans[0])
                for i in range(len(spans)):
                    feats = fut.result()
                    if i + 1 < len(spans):
                        fut = ex.submit(extract, spans[i + 1])
                    yield convert_chunk(feats)

        yield from self._vocode_segments(
            stitch_mel_stream(spans, mels()), vocoder_context_frames)

    def convert_wav_stream_live(
        self, audio_chunks, sr: int,
        ref_feats: Dict[str, np.ndarray],
        chunk_frames: int = 64, overlap_frames: int = 16,
        extract_ctx_frames: int = 32, vocoder_context_frames: int = 32,
        f0_range: Optional[Tuple[float, float]] = None,
    ):
        """LIVE input-side streaming: consume an ITERATOR of waveform
        chunks as they arrive (mic capture, a chunked upload) and yield
        ``(start_frame, mel_segment, wav_segment|None)`` with bounded
        lookahead — conversion runs WHILE the source is still being
        produced, a capability the reference (offline files, 30 s cap)
        has no analogue of.

        A span converts once ``chunk_frames + extract_ctx_frames`` of
        audio beyond its start has arrived, so the output trails the
        input by roughly ``(chunk + ctx + overlap) × 10 ms`` plus compute
        (defaults 64/32/16: measured **+0.61 s** behind live on one v5e
        chip; the lag/quality ladder in docs/SERVING.md shows every
        rung's MCD-vs-offline below the CFM stochastic floor, so the
        smallest-lag rung ships as the default — raise the knobs for
        more extraction context per request).
        Feeding the whole waveform as one chunk reproduces
        :meth:`convert_wav_stream` with a uniform (non-ramped) schedule
        exactly.

        ``audio_chunks`` must already be at the model's sample rate
        (resample at the edge — live polyphase state is the client's);
        each chunk is validated on arrival so a malformed piece faults
        the stream immediately, not after conversion.
        """
        if self._content_fn is None:
            raise RuntimeError(
                "raw-audio conversion requires contentvec_ckpt")
        from serenade_tpu.features import (
            FeatureConfig, extract_stream_window, stream_total_frames,
            validate_waveform,
        )
        from serenade_tpu.ops.longform import StreamStitcher

        fc = FeatureConfig.from_dict(self.config)
        if sr != fc.sampling_rate:
            raise ValueError(
                f"live streaming needs {fc.sampling_rate} Hz audio, got "
                f"{sr}; resample chunks client-side")
        convert_chunk = self._chunk_converter(ref_feats)
        minf0, maxf0 = f0_range or (70.0, 1100.0)
        hop = fc.hop_size

        def extract(audio, span):
            return extract_stream_window(
                audio, span, fc, minf0, maxf0,
                content_fn=self._content_fn,
                ctx_frames=extract_ctx_frames,
                with_f0_fluc=self.variant_new)

        def segments():
            stitcher = StreamStitcher()
            it = iter(audio_chunks)
            buf = np.zeros(0, np.float32)
            # `base`: absolute frame index of buf[0].  Samples no span
            # will read again (left of s - ctx) are trimmed as the
            # session advances — an indefinite live source must run in
            # BOUNDED memory, and the per-piece np.concatenate must not
            # copy the whole session's audio (O(n^2) total copying)
            s, base, done = 0, 0, False
            while True:
                new_base = max(base, s - extract_ctx_frames)
                if new_base > base:
                    buf = buf[(new_base - base) * hop:]
                    base = new_base
                e = s + chunk_frames
                # enough audio for the span + right context + the
                # content/STFT tails?
                need = (e - base + extract_ctx_frames) * hop + fc.fft_size
                while not done and len(buf) < need:
                    try:
                        piece = validate_waveform(next(it), "live chunk")
                    except StopIteration:
                        done = True
                        break
                    buf = np.concatenate([buf, np.asarray(piece,
                                                          np.float32)])
                if done:
                    break
                mel = convert_chunk(extract(buf, (s - base, e - base)))
                yield from stitcher.add((s, e), mel, next_start=e
                                        - overlap_frames)
                s = e - overlap_frames
            # source exhausted: the reflect tail pad _prepare_audio
            # applies to files, then drain the remaining spans
            if base == 0 and len(buf) < fc.fft_size:
                raise ValueError(
                    f"live stream ended after {len(buf)} samples — too "
                    "short to analyze")
            audio = np.pad(buf, (0, fc.fft_size), mode="reflect")
            n = stream_total_frames(base * hop + len(audio), fc)
            if n <= s:
                return
            while s < n:
                e = min(s + chunk_frames, n)
                mel = convert_chunk(extract(audio, (s - base, e - base)))
                last = e >= n
                yield from stitcher.add(
                    (s, e), mel, next_start=None if last else
                    e - overlap_frames)
                if last:
                    return
                s = e - overlap_frames

        yield from self._vocode_segments(segments(),
                                         vocoder_context_frames)

    def _vocode_segments(self, segments, vocoder_context_frames: int):
        """(start, mel_seg) stream -> (start, mel_seg, wav_seg|None):
        vocode each finalized region with ``vocoder_context_frames`` of
        already-final left context (re-synthesized and trimmed) so the
        HiFiGAN receptive field sees real history at segment joins."""
        mel_tail = None  # last ctx frames of already-emitted mel
        for start, seg in segments:
            wav_seg = None
            if self.vocoder is not None:
                ctx = 0 if mel_tail is None else mel_tail.shape[0]
                mel_in = seg if ctx == 0 else np.concatenate(
                    [mel_tail, seg], axis=0)
                wav, _ = self.vocoder.decode(mel_in)
                hop = len(wav) // mel_in.shape[0]
                wav_seg = wav[ctx * hop:]
            # seg[-0:] is the WHOLE segment, not "no context"
            mel_tail = (seg[-vocoder_context_frames:]
                        if vocoder_context_frames > 0 else None)
            yield start, seg, wav_seg

    def _source_frame_feats(self, src_feats):
        """The frame-aligned source streams chunked for long-form paths.

        jax arrays stay DEVICE-RESIDENT: the chunker only slices and the
        normalize/pack math is dtype-polymorphic, so content features
        extracted on device (batch24) never round-trip the host — for a
        60 s source that fetch alone is ~9 MB (≈1.5 s of time-to-first-
        audio on the tunnel), and each chunk re-uploaded its slice."""
        import jax

        keys = ("hubert", "score", "loud") + (
            ("f0_fluc",) if self.variant_new else ())
        return {k: src_feats[k] if isinstance(src_feats[k], jax.Array)
                else np.asarray(src_feats[k]) for k in keys}

    def _chunk_converter(self, ref_feats):
        """Per-chunk mel converter with the reference normalized, packed,
        and uploaded ONCE (it conditions every chunk identically) — shared
        by the offline and streaming long-form paths.  ``ref_feats`` may
        also be an already-packed device-resident handle from
        :meth:`pack_reference` (serving's registered styles), skipping
        even that one upload."""
        import jax

        if "x" in ref_feats and "lengths" in ref_feats:  # pack_reference
            ref_packed = ref_feats
        else:
            ref_packed, _ = self._pack(self._normalize_ref(ref_feats), True)

        def convert_chunk(chunk):
            src_p, t_chunk = self._pack(self._normalize_src(chunk), False)
            sub = self._next_key()
            return np.asarray(jax.device_get(
                self._infer(self.params, src_p, ref_packed, sub)
            ))[0, :t_chunk]

        return convert_chunk

    def pack_reference(self, ref_feats: Dict[str, np.ndarray]):
        """Normalize + pad one reference to its bucket and place it on
        device (batch dim 1).  The returned handle can be passed to
        ``convert_features_batch`` repeatedly — the arrays stay device
        resident, so registered styles cost no per-request upload."""
        packed, _ = self._pack(self._normalize_ref(ref_feats), True)
        import jax

        return jax.tree_util.tree_map(jax.device_put, packed)

    def convert_features_batch(
        self, src_list, ref_list=None, ts: Optional[int] = None,
        tr: Optional[int] = None, packed_ref=None,
        pad_batch_pow2: bool = False, return_device: bool = False,
    ):
        """Batched conversion: one jitted dispatch for N (src, ref) pairs
        padded to shared (ts, tr) buckets (serving.BatchingConverter's
        dispatch path; same packed-sequence batching as the decode CLI).
        Pass either per-request ``ref_list`` or one ``packed_ref`` from
        :meth:`pack_reference` shared by the whole batch.

        ``pad_batch_pow2`` pads the batch axis to the next power of two
        (serving: bounds the compiled-program count to log2(max_batch)
        per bucket pair — without it every distinct group size compiles
        its own program, which on slow-compile links stalls live traffic
        for minutes).

        Returns a list of per-request mels trimmed to true lengths.
        """
        import jax
        import jax.numpy as jnp

        from serenade_tpu.collaters.ssc import (
            bucket_length, next_pow2, pad_to,
        )

        def stack(feats_list, keys, T):
            def pad_np(a):
                a = np.asarray(a, np.float32)
                if a.ndim == 1:
                    a = a[:, None]
                return pad_to(a, T)

            def pad_dev(a):
                a = a.astype(jnp.float32)
                if a.ndim == 1:
                    a = a[:, None]
                if a.shape[0] >= T:
                    return a[:T]
                return jnp.pad(a, ((0, T - a.shape[0]), (0, 0)))

            out = {}
            for name, src_key in keys:
                vals = [f[src_key] for f in feats_list]
                if any(isinstance(v, jax.Array) for v in vals):
                    # device-resident features (raw-audio serving keeps
                    # extracted hubert on device): pad/stack there so the
                    # 768-d streams never round-trip host<->device
                    out[name] = jnp.stack([
                        pad_dev(v) if isinstance(v, jax.Array)
                        else jnp.asarray(pad_np(v)) for v in vals])
                else:
                    out[name] = jnp.asarray(
                        np.stack([pad_np(v) for v in vals]))
            out["lengths"] = jnp.asarray(
                [f["hubert"].shape[0] for f in feats_list])
            return out

        b = len(src_list)
        n_dev = self.mesh.shape["data"] if self.mesh is not None else 1
        target = b
        if pad_batch_pow2:
            target = next_pow2(b)
        target += (-target) % n_dev  # dp mesh: every device needs a sub-batch
        pad_b = target - b
        if pad_b:
            src_list = list(src_list) + [src_list[-1]] * pad_b
            if ref_list is not None:
                ref_list = list(ref_list) + [ref_list[-1]] * pad_b
        fluc = [("f0_fluc", "f0_fluc")] if self.variant_new else []
        ts = ts or max(bucket_length(f["hubert"].shape[0]) for f in src_list)
        src_n = [self._normalize_src(f) for f in src_list]
        src = stack(src_n, [("x", "hubert"), ("midi", "score"),
                            ("loud", "loud")] + fluc, ts)
        bp = len(src_list)  # b + dp padding
        if packed_ref is not None:
            # device-side tile of the registered reference; no host upload
            ref = {k: (jnp.broadcast_to(v, (bp,) + v.shape[1:])
                       if v.ndim > 1 else jnp.broadcast_to(v, (bp,)))
                   for k, v in packed_ref.items()}
        else:
            tr = tr or max(bucket_length(f["hubert"].shape[0])
                           for f in ref_list)
            ref_n = [self._normalize_ref(f) for f in ref_list]
            ref = stack(ref_n, [("x", "hubert"), ("midi", "score"),
                                ("loud", "loud"), ("logmel", "logmel")]
                        + fluc, tr)
        if self.mesh is not None:
            from serenade_tpu.parallel import shard_batch

            src = shard_batch(src, self.mesh)
            ref = shard_batch(ref, self.mesh)
        sub = self._next_key()
        out = self._infer(self.params, src, ref, sub)
        if return_device:
            # (B_padded, ts, 80) device mels + true lengths of the b real
            # rows: the serving dispatcher chains the vocoder on device,
            # so mels are fetched once (for clients) and never re-uploaded
            return out, [f["hubert"].shape[0] for f in src_list[:b]]
        mels = np.asarray(jax.device_get(out))
        return [mels[i, : f["hubert"].shape[0]]
                for i, f in enumerate(src_list[:b])]

    def extract_from_wav(self, wav: np.ndarray, sr: int,
                         name: str = "utt",
                         f0_range: Optional[Tuple[float, float]] = None,
                         ) -> Dict[str, np.ndarray]:
        """On-device feature extraction from raw audio (mel/loudness/F0 +
        ContentVec + transcribed score) into the feature-dict form every
        convert_* method takes — the serving path for raw-audio requests,
        where the wire payload is ~48x smaller than 768-d content
        features.  Requires a ContentVec checkpoint.

        ``f0_range=(minf0, maxf0)`` narrows the F0 search to the singer's
        range (the reference preprocesses with per-voice-type ranges from
        conf/f0.yaml, preprocess.py:475-493; defaults 70-1100 Hz)."""
        if self._content_fn is None:
            raise RuntimeError(
                "raw-audio conversion requires contentvec_ckpt; use "
                "convert_features with precomputed dumps otherwise"
            )
        from serenade_tpu.features import FeatureConfig, extract_features

        fc = FeatureConfig.from_dict(self.config)
        f = extract_features(name, np.asarray(wav), sr, fc,
                             content_fn=self._content_fn,
                             with_f0_fluc=self.variant_new,
                             f0_range=f0_range)
        if f is None:
            raise ValueError(f"feature extraction failed for {name}")
        f["score"] = f["est_lf0_score"]
        return f

    def extract_from_wav_batch(self, wavs, srs, f0_ranges=None) -> list:
        """Batched on-device extraction for N raw waveforms: same-bucket
        utterances share one fused mel/loudness/F0 program and ContentVec
        dispatches batch (features.extract_features_batch — the
        preprocessing fast path, reused by the serving dispatcher).
        Returns a list of feature dicts (None where extraction failed)."""
        if self._content_fn is None:
            raise RuntimeError(
                "raw-audio conversion requires contentvec_ckpt; use "
                "convert_features with precomputed dumps otherwise"
            )
        from serenade_tpu.features import (
            FeatureConfig, extract_features_batch,
        )

        fc = FeatureConfig.from_dict(self.config)
        names = [f"req{i}" for i in range(len(wavs))]
        feats = extract_features_batch(
            [(n, np.asarray(w), sr, None)
             for n, w, sr in zip(names, wavs, srs)],
            fc, content_fn=self._content_fn,
            with_f0_fluc=self.variant_new, pad_group_pow2=True,
            wire_dtype="int16",  # PCM16 uploads: half the wire, and the
            # 24->16 kHz resample runs inside the HuBERT program
            f0_ranges=f0_ranges,  # per-request F0 search ranges
        )
        out = []
        for n in names:
            f = feats.get(n)
            if f is not None:
                f["score"] = f["est_lf0_score"]
            out.append(f)
        return out

    def convert_wav(self, src_wav: np.ndarray, ref_wav: np.ndarray,
                    sr: int) -> Tuple[np.ndarray, Optional[np.ndarray],
                                      Optional[int]]:
        """Raw-audio conversion (extracts features on the fly; requires a
        ContentVec checkpoint)."""
        return self.convert_features(
            self.extract_from_wav(src_wav, sr, "src"),
            self.extract_from_wav(ref_wav, sr, "ref"),
        )

    def style_embedding(self, wav: Optional[np.ndarray] = None,
                        sr: Optional[int] = None,
                        logmel: Optional[np.ndarray] = None) -> np.ndarray:
        """GST style embedding (embed_dim,) of a waveform or an
        un-normalized (T, num_mels) logmel — the model's own measure of
        singing style, used by `bin/evaluate --ref-dict` to score style
        transfer (cosine of converted output vs the style reference)."""
        import jax
        import jax.numpy as jnp

        from serenade_tpu.collaters.ssc import bucket_length, pad_to
        from serenade_tpu.features import FeatureConfig

        if logmel is None:
            from serenade_tpu.ops.mel import logmelfilterbank
            from serenade_tpu.utils.audio import resample, to_mono

            fc = FeatureConfig.from_dict(self.config)
            wav = to_mono(np.asarray(wav, np.float32))
            if sr is not None and sr != fc.sampling_rate:
                wav = resample(wav, sr, fc.sampling_rate)
            logmel = np.asarray(logmelfilterbank(
                jnp.asarray(wav), fc.sampling_rate, fft_size=fc.fft_size,
                hop_size=fc.hop_size, win_length=fc.win_length,
                num_mels=fc.num_mels, fmin=fc.fmin, fmax=fc.fmax,
                eps=fc.eps, log_base=fc.log_base))
        s = self.scaler["logmel"]
        mel_n = (np.asarray(logmel) - s.mean_) / s.scale_
        t = mel_n.shape[0]
        if self._gst_fn is None:
            from serenade_tpu.quantize import dequantize_tree

            self._gst_fn = jax.jit(
                lambda p, mel, lens: self.model.apply(
                    dequantize_tree(p), mel, lens,
                    method=lambda m, mel_, l_: m.gst(mel_, l_)))
        mel_b = jnp.asarray(pad_to(mel_n.astype(np.float32),
                                   bucket_length(t)))[None]
        emb = self._gst_fn(self.params, mel_b, jnp.asarray([t]))
        return np.asarray(emb)[0]
