"""Per-utterance feature extraction pipeline (offline preprocessing core).

The computational counterpart of reference bin/preprocess.py:399-611 /
preprocess_new.py, factored out of the CLI so it is testable and reusable.
The dense signal work (mel, loudness, F0) runs jitted on the accelerator;
host code only does resampling, score alignment, and h5 writes.

Content features: the flax ContentVec encoder when a converted checkpoint is
available (modules/contentvec.py); otherwise extraction degrades to
``hubert=None`` and the caller decides (the reference hard-depends on the HF
download, preprocess.py:361-368 — offline environments need the explicit
gate).

Score MIDI: ground-truth from GTSinger JSON when present; the estimated
score comes from the phoneme_midi transcriber when its checkpoint is
available, else from YIN-F0 note segmentation (ops/midi.py) — same output
contract (`est_lf0_score` log-Hz frames).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from serenade_tpu.ops.f0 import smooth_f0_median, yin_f0, yin_f0_viterbi
from serenade_tpu.ops.mel import logmelfilterbank, loudness_extract
from serenade_tpu.ops.midi import (
    f0_to_note_events,
    midi_note_array_to_hz,
    note_seq_to_frames,
    notes_to_frames,
)
from serenade_tpu.utils.audio import resample, to_mono

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class FeatureConfig:
    sampling_rate: int = 24000
    fft_size: int = 512
    hop_size: int = 240
    win_length: int = 480
    window: str = "hann"
    num_mels: int = 80
    fmin: float = 63.0
    fmax: float = 12000.0
    eps: float = 1e-6
    log_base: float = 10.0
    shiftms: float = 10.0

    @classmethod
    def from_dict(cls, d: Dict):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def spk_id_from_utt(utt_id: str) -> str:
    """GTSinger utt_id -> speaker key for the f0-range table
    (reference preprocess.py:475-478 parsing)."""
    try:
        return utt_id.split("_")[3].split("-")[1]
    except IndexError:
        return utt_id


def f0_range_for(utt_id: str, f0_table: Optional[Dict]) -> tuple:
    spk = spk_id_from_utt(utt_id)
    if f0_table and spk in f0_table:
        return float(f0_table[spk]["minf0"]), float(f0_table[spk]["maxf0"])
    logger.info("no f0 range for %s; using defaults", spk)
    return 70.0, 1100.0  # reference preprocess.py:482-483 defaults


@functools.lru_cache(maxsize=None)
def _signal_program(fs: int, fft_size: int, hop_size: int, win_length: int,
                    num_mels: int, fmin: float, fmax: float, eps: float,
                    log_base: float, shiftms: float, minf0: float,
                    maxf0: float, backend: str):
    """One fused jitted program computing logmel + loudness + smoothed F0
    for a (B, L) batch of same-length waveforms — a single device dispatch
    per utterance GROUP instead of three per utterance (the tunnel's
    per-dispatch latency dominates offline extraction otherwise)."""
    import jax
    import jax.numpy as jnp

    def one(wav):
        if jnp.issubdtype(wav.dtype, jnp.integer):
            # int16 wire: dequantize INSIDE the program (read_wav's /32768
            # convention) — an eager astype/div would cost extra tunneled
            # dispatches per group
            wav = wav.astype(jnp.float32) / 32768.0
        logmel = logmelfilterbank(
            wav, fs, fft_size=fft_size, hop_size=hop_size,
            win_length=win_length, num_mels=num_mels, fmin=fmin, fmax=fmax,
            eps=eps, log_base=log_base,
        )
        loud = loudness_extract(wav, fs, hop_size)
        if backend in ("native", "harvest_native"):  # F0 on host; mel+loud only
            return logmel, loud
        if backend == "harvest":
            from serenade_tpu.ops.harvest import harvest_f0 as f0_fn
        else:
            f0_fn = yin_f0_viterbi if backend == "viterbi" else yin_f0
        f0_raw, _ = f0_fn(wav, fs=fs, f0_floor=minf0, f0_ceil=maxf0,
                          frame_period_ms=shiftms)
        return logmel, loud, smooth_f0_median(f0_raw)

    return jax.jit(jax.vmap(one))


def _bucketed(audio: np.ndarray, hop_size: int) -> Tuple[np.ndarray, int]:
    """Pad to the length bucket so the jitted signal ops compile once per
    bucket instead of once per utterance (XLA shape specialization).
    Returns (padded audio, true frame count)."""
    n_frames = 1 + len(audio) // hop_size
    bucket = 128 * hop_size
    padded_len = ((len(audio) + bucket - 1) // bucket) * bucket
    return np.pad(audio, (0, padded_len - len(audio))), n_frames


def extract_signal_features_group(
    audios_b: Sequence[np.ndarray],
    config: FeatureConfig,
    minf0: float,
    maxf0: float,
    f0_backend: str = "viterbi",
    wire_dtype: str = "float32",
) -> List[Dict[str, np.ndarray]]:
    """Batched mel/loudness/F0 for same-length bucketed waveforms sharing
    an F0 search range (same singer).  Full padded-length outputs; callers
    slice to each utterance's frame count.

    ``wire_dtype="int16"`` quantizes the waveform upload to PCM16 and
    dequantizes on device — half the host→device bytes; lossless for
    PCM16 sources (read_wav's k/32768 values hit the grid exactly),
    ≤1.6e-5 amplitude noise otherwise (online serving opts in; the
    offline preprocess CLI keeps f32).
    """
    import jax.numpy as jnp

    fn = _signal_program(
        config.sampling_rate, config.fft_size, config.hop_size,
        config.win_length, config.num_mels, config.fmin, config.fmax,
        config.eps, config.log_base, config.shiftms, minf0, maxf0,
        f0_backend,
    )
    if wire_dtype == "int16":
        # /32768 convention matches utils.audio.read_wav's PCM16 decode, so
        # audio that originated as PCM16 round-trips the wire losslessly;
        # the int16 batch uploads as-is and dequantizes inside the program
        batch = jnp.stack([jnp.asarray(
            np.clip(np.round(a * 32768.0), -32768, 32767).astype(np.int16))
            for a in audios_b])
    else:
        batch = jnp.stack([jnp.asarray(a) for a in audios_b])
    if f0_backend in ("native", "harvest_native"):
        import jax

        from serenade_tpu.native import harvest_f0_native, yin_f0_native

        host_f0 = (harvest_f0_native if f0_backend == "harvest_native"
                   else yin_f0_native)
        logmel, loud = (np.asarray(a) for a in fn(batch))
        raw = np.stack([host_f0(
            a, fs=config.sampling_rate, f0_floor=minf0, f0_ceil=maxf0,
            frame_period_ms=config.shiftms,
        )[0] for a in audios_b])
        # ONE vmapped smoothing dispatch for the whole group (a per-row
        # device call would pay the tunnel dispatch floor per utterance)
        f0 = np.asarray(jax.vmap(smooth_f0_median)(jnp.asarray(raw)))
    else:
        logmel, loud, f0 = (np.asarray(a) for a in fn(batch))
    return [
        {"logmel": logmel[i], "loud": loud[i], "f0": f0[i]}
        for i in range(len(audios_b))
    ]


def extract_features(
    utt_id: str,
    audio: np.ndarray,
    fs: int,
    config: FeatureConfig,
    *,
    f0_table: Optional[Dict] = None,
    gt_note_seq: Optional[list] = None,
    content_fn=None,
    midi_transcribe_fn=None,
    with_f0_fluc: bool = False,
    f0_backend: str = "viterbi",
    f0_range: Optional[tuple] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Extract the full per-utterance feature dict (h5 key contract of
    preprocess.py:566-611: wave,hubert,logmel,loud,gt_lf0_score,
    est_lf0_score,f0,vuv,midi[,f0_fluc]).

    ``f0_range=(minf0, maxf0)`` overrides the voice-type table lookup —
    the serving path's equivalent of the reference's per-voice-type F0
    search ranges (conf/f0.yaml, preprocess.py:475-493), where no
    utt-id → singer mapping exists."""
    audio = _prepare_audio(utt_id, audio, fs, config)
    audio_b, n_frames = _bucketed(audio, config.hop_size)
    minf0, maxf0 = f0_range or f0_range_for(utt_id, f0_table)
    sig = extract_signal_features_group(
        [audio_b], config, minf0, maxf0, f0_backend
    )[0]
    return _finalize_utt(
        utt_id, audio, config, sig, n_frames, maxf0,
        gt_note_seq=gt_note_seq, content_fn=content_fn,
        midi_transcribe_fn=midi_transcribe_fn, with_f0_fluc=with_f0_fluc,
    )


def validate_waveform(audio, name: str = "audio") -> np.ndarray:
    """Host-side sanity check for an incoming waveform (serving enqueues
    call this so a malformed request faults ALONE, before it can join a
    batched extraction window).  Returns the mono float array."""
    audio = to_mono(np.asarray(audio))
    if audio.size == 0:
        raise ValueError(f"{name}: empty waveform")
    if not np.isfinite(audio).all():
        raise ValueError(f"{name}: non-finite samples")
    if np.abs(audio).max() > 1.0:
        raise ValueError(f"{name}: audio not normalized to [-1, 1]")
    return audio


def _prepare_audio(utt_id, audio, fs, config: FeatureConfig) -> np.ndarray:
    audio = validate_waveform(audio, utt_id)
    if fs != config.sampling_rate:
        audio = resample(audio, fs, config.sampling_rate)
    # length alignment pad (reference preprocess.py:430-432)
    return np.pad(audio, (0, config.fft_size), mode="reflect")


def _finalize_utt(
    utt_id, audio, config: FeatureConfig, sig, n_frames: int, maxf0: float,
    *, gt_note_seq=None, content_fn=None, midi_transcribe_fn=None,
    with_f0_fluc: bool = False, hubert=None,
) -> Optional[Dict[str, np.ndarray]]:
    """Host-side tail of per-utterance extraction: content features, score
    MIDI, f0_fluc, length alignment (everything after the batched signal
    program).  ``hubert`` short-circuits content extraction when the batch
    path already computed it."""
    logmel = sig["logmel"][:n_frames]
    loud = sig["loud"][:n_frames, None]
    f0 = sig["f0"][:n_frames, None]
    vuv = (f0 != 0).astype(np.float32)

    # content features
    if hubert is None and content_fn is not None:
        audio16k = resample(audio, config.sampling_rate, 16000)
        hubert = np.asarray(content_fn(audio16k))

    # estimated score MIDI
    total_seconds = audio.shape[-1] / config.sampling_rate
    if midi_transcribe_fn is not None:
        notes, intervals = midi_transcribe_fn(audio, config.sampling_rate)
    else:
        notes, intervals = f0_to_note_events(
            f0[:, 0], frame_shift_s=config.shiftms / 1000.0
        )
    if not notes:
        logger.info("skipping %s: no MIDI information", utt_id)
        return None
    midi = notes_to_frames(notes, intervals, total_seconds,
                           shift_ms=config.shiftms)
    est_lf0_score = midi_note_array_to_hz(midi, log_f0=True)[:, None]

    # ground-truth score MIDI
    if gt_note_seq is not None:
        gt_midi = note_seq_to_frames(gt_note_seq, config.shiftms / 1000.0)
        gt_lf0_score = midi_note_array_to_hz(gt_midi, log_f0=True)[:, None]
    else:
        gt_lf0_score = est_lf0_score.copy()

    feats = {
        "wave": audio.astype(np.float32),
        "logmel": logmel.astype(np.float32),
        "loud": loud.astype(np.float32),
        "f0": f0.astype(np.float32),
        "vuv": vuv.astype(np.float32),
        "midi": midi[:, None].astype(np.float32),
        "est_lf0_score": est_lf0_score.astype(np.float32),
        "gt_lf0_score": gt_lf0_score.astype(np.float32),
    }
    if hubert is not None:
        feats["hubert"] = hubert.astype(np.float32)

    if with_f0_fluc:
        feats["f0_fluc"] = compute_f0_fluctuation(
            f0[:, 0], maxf0, config.shiftms
        )[:, None].astype(np.float32)

    # truncate every frame stream to the common min length
    # (reference preprocess.py:545-553)
    frame_keys = [k for k in feats if k != "wave"]
    min_len = min(feats[k].shape[0] for k in frame_keys)
    for k in frame_keys:
        feats[k] = feats[k][:min_len]
    return feats


def stream_total_frames(audio_len: int, config: FeatureConfig,
                        with_hubert: bool = True) -> int:
    """Frame count a streamed conversion of a ``_prepare_audio``'d waveform
    of ``audio_len`` samples will produce — the min over the per-stream
    frame counts, mirroring :func:`_finalize_utt`'s common-min-length
    truncation (mel ``1 + L//hop``; ContentVec ``(L16-400)//160+1`` after
    the 16 kHz resample; score ``ceil(seconds/shift)``)."""
    n = 1 + audio_len // config.hop_size
    n = min(n, int(np.ceil(
        audio_len / config.sampling_rate / (config.shiftms / 1000.0))))
    if with_hubert:
        n16 = (audio_len * 16000 + config.sampling_rate - 1) \
            // config.sampling_rate
        n = min(n, (n16 - 400) // 160 + 1)
    return n


def extract_stream_window(
    audio: np.ndarray,
    span: Tuple[int, int],
    config: FeatureConfig,
    minf0: float,
    maxf0: float,
    *,
    content_fn=None,
    f0_backend: str = "viterbi",
    ctx_frames: int = 256,
    with_f0_fluc: bool = False,
    wire_dtype: str = "int16",
) -> Dict[str, np.ndarray]:
    """Source-side feature dict (``hubert``/``score``/``loud``/``f0``
    [, ``f0_fluc``]) for frames ``[s, e)`` of an already
    ``_prepare_audio``'d waveform, extracted from a context-padded window
    — the streaming-latency form of :func:`extract_features`: the first
    conversion chunk's features are ready after one window's worth of
    device work instead of the whole utterance's.

    Alignment: the window starts at an exact frame boundary
    (``(s-lc)*hop`` samples, which is also an exact 16 kHz sample for the
    ContentVec path at 24 kHz), so window frame ``lc+i`` IS global frame
    ``s+i``.  With ``ctx_frames`` of context on both sides the windowed
    mel/loudness/F0 match full-utterance extraction in the span interior
    (STFT and YIN receptive fields are a handful of frames; Viterbi
    smoothing converges well inside 2.5 s of context).  The two remaining
    deviations are quantified in tests/test_stream_windowed.py: the
    loudness top-db clamp is relative to the window (not global) max, and
    ContentVec's transformer attends only within the window.  Note events
    for the score are segmented over the window INCLUDING context so
    notes straddling the span boundary keep their extent.
    """
    s, e = span
    hop = config.hop_size
    n = e - s
    if content_fn is not None:
        # ContentVec's 400-sample receptive field eats ~2 frames at the
        # window tail ((K*160-400)//160+1 = K-2): below 2 frames of
        # context every interior window would come up short
        ctx_frames = max(ctx_frames, 2)
    lc = min(s, ctx_frames)
    start = (s - lc) * hop
    if start >= len(audio):
        raise ValueError(
            f"span {span} starts past the waveform "
            f"({len(audio)} samples); respect stream_total_frames")
    win = audio[start: min(len(audio), (e + ctx_frames) * hop)]
    win_b, n_frames_w = _bucketed(win, hop)
    sig = extract_signal_features_group(
        [win_b], config, minf0, maxf0, f0_backend, wire_dtype=wire_dtype,
    )[0]
    if lc + n > n_frames_w:
        raise ValueError(
            f"span {span} exceeds the window's {n_frames_w} frames "
            f"(total frames bound the caller should respect: "
            f"stream_total_frames)")
    f0_w = np.asarray(sig["f0"][:n_frames_w])

    shift_s = config.shiftms / 1000.0
    notes, intervals = f0_to_note_events(f0_w, frame_shift_s=shift_s)
    if notes:
        midi_w = notes_to_frames(notes, intervals,
                                 len(win) / config.sampling_rate,
                                 shift_ms=config.shiftms)
    else:
        midi_w = np.zeros(n_frames_w, np.int32)
    if midi_w.shape[0] < lc + n:  # ceil-rounding guard at the stream tail
        midi_w = np.pad(midi_w, (0, lc + n - midi_w.shape[0]))
    score = midi_note_array_to_hz(midi_w[lc:lc + n], log_f0=True)[:, None]

    feats = {
        "loud": np.asarray(sig["loud"][lc:lc + n])[:, None]
        .astype(np.float32),
        "f0": f0_w[lc:lc + n, None].astype(np.float32),
        "score": score.astype(np.float32),
    }
    if content_fn is not None:
        if (hasattr(content_fn, "batch24")
                and config.sampling_rate == 24000):
            hub = content_fn.batch24([win], wire_dtype=wire_dtype)[0]
        else:
            hub = content_fn(resample(win, config.sampling_rate, 16000))
        if hub.shape[0] < lc + n:
            raise ValueError(
                f"content window produced {hub.shape[0]} frames, span "
                f"{span} needs {lc + n} — caller exceeded "
                f"stream_total_frames")
        # device-resident slice on the batch24 path: the chunk pack
        # consumes it without a host round trip
        feats["hubert"] = hub[lc:lc + n]
    if with_f0_fluc:
        feats["f0_fluc"] = compute_f0_fluctuation(
            f0_w, maxf0, config.shiftms
        )[lc:lc + n, None].astype(np.float32)
    return feats


def compute_f0_fluctuation(f0: np.ndarray, maxf0: float,
                           shiftms: float = 10.0) -> np.ndarray:
    """Spline-smoothed F0 residual (reference preprocess_new.py:538-550)."""
    from scipy.interpolate import UnivariateSpline

    t = np.arange(len(f0)) * shiftms / 1000.0
    f0_normed = np.asarray(f0, np.float64) / maxf0
    spline = UnivariateSpline(t, f0_normed, s=10)
    return (f0_normed - spline(t)).astype(np.float32)


def extract_features_batch(
    items: Sequence[Tuple[str, np.ndarray, int, Optional[list]]],
    config: FeatureConfig,
    *,
    f0_table: Optional[Dict] = None,
    content_fn=None,
    midi_transcribe_fn=None,
    with_f0_fluc: bool = False,
    f0_backend: str = "viterbi",
    max_group: int = 8,
    pad_group_pow2: bool = False,
    wire_dtype: str = "float32",
    f0_ranges: Optional[Sequence[Optional[tuple]]] = None,
) -> Dict[str, Optional[Dict[str, np.ndarray]]]:
    """Batched extraction over ``(utt_id, audio, fs, gt_note_seq)`` items.

    Utterances sharing a length bucket and an F0 search range (same singer)
    are vmapped through ONE fused mel+loudness+F0 device program — results
    are identical to :func:`extract_features` per utterance (same padded
    shapes), but offline extraction stops paying per-utterance dispatch
    latency.  Returns ``{utt_id: feats_or_None}`` (None = skipped, same
    contract as the per-utterance path).

    ``pad_group_pow2`` pads each device group to the next power of two
    (repeating the last utterance, results dropped) so ONLINE serving
    compiles at most log2(max_group) signal programs per bucket instead
    of one per distinct group size.

    ``wire_dtype="int16"`` (online serving) halves waveform uploads by
    quantizing them to PCM16 (dequantized on device) and, when the
    content fn supports it, runs the 24→16 kHz resample ON DEVICE inside
    the HuBERT program — eliminating the second per-request waveform
    upload entirely.  Offline preprocessing keeps the f32 default.
    """
    out: Dict[str, Optional[Dict[str, np.ndarray]]] = {}
    prepared = []
    # f0_ranges: per-item (minf0, maxf0) overrides aligned with items
    # (None entries fall back to the voice-type table); items with
    # different ranges split into separate device groups below
    for j, (utt_id, audio, fs, gt_note_seq) in enumerate(items):
        try:
            audio_p = _prepare_audio(utt_id, audio, fs, config)
        except Exception as e:  # noqa: BLE001 — a bad item skips ALONE
            logger.warning("skipping %s: %s", utt_id, e)
            out[utt_id] = None
            continue
        audio_b, n_frames = _bucketed(audio_p, config.hop_size)
        override = f0_ranges[j] if f0_ranges is not None else None
        minf0, maxf0 = override or f0_range_for(utt_id, f0_table)
        prepared.append(
            (utt_id, audio_p, audio_b, n_frames, minf0, maxf0, gt_note_seq)
        )

    groups: Dict[tuple, list] = {}
    for i, rec in enumerate(prepared):
        key = (rec[2].shape[0], rec[4], rec[5])  # (padded_len, minf0, maxf0)
        groups.setdefault(key, []).append(i)

    # batched content features (one HuBERT dispatch per 16 kHz bucket group)
    huberts: Dict[int, np.ndarray] = {}
    if (content_fn is not None and hasattr(content_fn, "batch24")
            and wire_dtype == "int16" and config.sampling_rate == 24000):
        # device-side resample: one 24 kHz int16 upload feeds HuBERT
        huberts = dict(enumerate(content_fn.batch24(
            [rec[1] for rec in prepared], wire_dtype=wire_dtype)))
    elif content_fn is not None and hasattr(content_fn, "batch"):
        audio16ks = [
            resample(rec[1], config.sampling_rate, 16000) for rec in prepared
        ]
        huberts = dict(enumerate(content_fn.batch(audio16ks)))

    for (padded_len, minf0, maxf0), idxs in groups.items():
        for lo in range(0, len(idxs), max_group):
            chunk = idxs[lo:lo + max_group]
            run = chunk
            if pad_group_pow2:
                from serenade_tpu.collaters.ssc import pad_pow2

                run = pad_pow2(chunk)
            sigs = extract_signal_features_group(
                [prepared[i][2] for i in run], config, minf0, maxf0,
                f0_backend, wire_dtype=wire_dtype,
            )
            for i, sig in zip(chunk, sigs):
                utt_id, audio_p, _, n_frames, _, mx, gt_note_seq = prepared[i]
                try:
                    out[utt_id] = _finalize_utt(
                        utt_id, audio_p, config, sig, n_frames, mx,
                        gt_note_seq=gt_note_seq, content_fn=content_fn,
                        midi_transcribe_fn=midi_transcribe_fn,
                        with_f0_fluc=with_f0_fluc, hubert=huberts.get(i),
                    )
                except Exception as e:  # noqa: BLE001 — skips ALONE, like
                    # the _prepare_audio guard above (e.g. a clip too
                    # short for the f0_fluc spline must not abort the
                    # whole batch)
                    logger.warning("skipping %s: %s", utt_id, e)
                    out[utt_id] = None
    return out
