"""AOT deployment artifacts: the whole conversion program as StableHLO.

``export_converter`` serializes the full hot path of `serenade-decode`
(feature normalization + packed ref‖src CFM inference + optional HiFiGAN
vocoding, reference ssc_decode.py:388-455) into one self-contained
directory: a manifest plus one ahead-of-time lowered program per shape
bucket, with the model weights and normalization statistics baked in as
constants.  ``ExportedConverter`` reloads and runs it **without** the model
code, config registry, checkpoint machinery, or scaler pickles — the
production hand-off unit.

The reference has no deployment story: serving a checkpoint there means
importing the whole package and unpickling torch state dicts
(ssc_decode.py:284-341).  The TPU-native counterpart is `jax.export`
StableHLO with a stable calling convention; artifacts are exported for an
explicit platform list (default: current backend + cpu) so the same
directory runs on TPU hosts and is testable on CPU.

Export forces the portable compute paths — XLA attention and the conv
lowering of the vocoder resblocks — instead of the Pallas kernels: Pallas
lowers to backend-specific custom calls that `jax.export` rightly refuses
to serialize as stable, and both backends are parity-tested equal
(tests/test_attention.py, tests/test_resblock_pallas.py).  At the default
decode buckets (packed T < 2048) the XLA paths are also the measured-faster
choice (docs/PROFILING.md).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _bucket_name(ts: int, tr: int) -> str:
    return f"convert_s{ts}_r{tr}"


def _scaler_consts(scaler, variant_new: bool):
    """Normalization constants baked into the exported program
    (the stats.joblib contract of compute_statistics.py)."""
    import jax.numpy as jnp

    c = {
        "hubert_mean": jnp.asarray(scaler["hubert"].mean_, jnp.float32),
        "hubert_scale": jnp.asarray(scaler["hubert"].scale_, jnp.float32),
        "logmel_mean": jnp.asarray(scaler["logmel"].mean_, jnp.float32),
        "logmel_scale": jnp.asarray(scaler["logmel"].scale_, jnp.float32),
        "score_min": jnp.asarray(scaler["score"].data_min_, jnp.float32),
        "score_rng": jnp.asarray(
            scaler["score"].data_max_ - scaler["score"].data_min_,
            jnp.float32),
        "loud_min": jnp.asarray(scaler["loud"].data_min_, jnp.float32),
        "loud_rng": jnp.asarray(
            scaler["loud"].data_max_ - scaler["loud"].data_min_, jnp.float32),
    }
    del variant_new  # f0_fluc is unscaled (audio_mel_dataset.py:188,220)
    return c


def export_converter(
    conv,
    out_dir: str,
    buckets: Sequence[Tuple[int, int]] = ((1024, 512),),
    platforms: Optional[Sequence[str]] = None,
    solver: Optional[str] = None,
) -> dict:
    """Export ``conv`` (an ``api.Converter``) for the given
    (src_frames, ref_frames) buckets.  Returns the manifest dict.
    ``solver`` defaults to the Converter's own resolved choice.

    Each bucket program takes raw (un-normalized, h5-layout) features
    padded to the bucket shape plus threefry key data, and returns the
    normalized converted mel — and the vocoded waveform when the Converter
    carries a vocoder.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from serenade_tpu.ops import attention

    if solver is None:
        solver = getattr(conv, "solver", "euler")
    if platforms is None:
        cur = jax.default_backend()
        cur = "tpu" if cur not in ("cpu", "gpu") else cur
        platforms = (cur, "cpu") if cur != "cpu" else ("cpu",)
    platforms = tuple(dict.fromkeys(platforms))  # dedupe, keep order

    os.makedirs(out_dir, exist_ok=True)
    consts = _scaler_consts(conv.scaler, conv.variant_new)
    content_dim = int(np.asarray(conv.scaler["hubert"].mean_).shape[0])
    mel_dim = int(np.asarray(conv.scaler["logmel"].mean_).shape[0])
    params = conv.params
    model = conv.model
    variant_new = conv.variant_new

    voc = conv.vocoder
    voc_model = voc_params = None
    hop = None
    if voc is not None:
        # portable conv lowering of the resblocks (see module docstring)
        voc_model = voc.model.clone(resblock_backend="conv")
        voc_params = voc.params
        hop = int(np.prod(voc.model.upsample_scales))

    def make_fn(ts: int, tr: int):
        def fn(src_x, src_len, src_score, src_loud, src_fluc,
               ref_x, ref_len, ref_logmel, ref_score, ref_loud, ref_fluc,
               key_data):
            key = jax.random.wrap_key_data(key_data)
            # the data-pipeline convention is "padding == 0 in NORMALIZED
            # space" (collaters/ssc.py pad_to runs after the scaler):
            # re-zero padded frames after in-program normalization so
            # boundary convolutions see exactly what the live path sees
            m_src = (jnp.arange(ts)[None, :, None] < src_len[:, None, None]
                     ).astype(jnp.float32)
            m_ref = (jnp.arange(tr)[None, :, None] < ref_len[:, None, None]
                     ).astype(jnp.float32)
            n = lambda a, m, s, msk: (a - m) / s * msk
            mm = lambda a, lo, rng, msk: (a - lo) / rng * msk
            args = [
                n(src_x, consts["hubert_mean"], consts["hubert_scale"],
                  m_src),
                src_len,
                mm(src_score, consts["score_min"], consts["score_rng"],
                   m_src),
                mm(src_loud, consts["loud_min"], consts["loud_rng"], m_src),
            ]
            if variant_new:
                args.append(src_fluc * m_src)
            args += [
                n(ref_x, consts["hubert_mean"], consts["hubert_scale"],
                  m_ref),
                ref_len,
                n(ref_logmel, consts["logmel_mean"],
                  consts["logmel_scale"], m_ref),
                mm(ref_score, consts["score_min"], consts["score_rng"],
                   m_ref),
                mm(ref_loud, consts["loud_min"], consts["loud_rng"], m_ref),
            ]
            if variant_new:
                args.append(ref_fluc * m_ref)
            # identity on float trees; with Converter(quantize="int8")
            # the weights serialize as int8 constants (~4x smaller
            # artifact) and dequantize inside the program
            from serenade_tpu.quantize import dequantize_tree

            mel = model.apply(
                dequantize_tree(params), *args, rng=key,
                n_timesteps=conv.n_timesteps,
                temperature=conv.temperature, solver=solver,
                method="inference",
            )
            if voc_model is None:
                return (mel,)
            # edge-pad past the true length before vocoding (zero-padding
            # in normalized mel space means average energy, audible
            # through the conv receptive field — same rationale as
            # Vocoder.decode_batch_device)
            idx = jnp.minimum(jnp.arange(ts)[None, :],
                              (src_len - 1)[:, None])
            c = jnp.take_along_axis(mel, idx[:, :, None], axis=1)
            if voc.take_norm_feat:
                c = c * jnp.asarray(voc.trg_stats["scale"]) + jnp.asarray(
                    voc.trg_stats["mean"])
            c = (c - jnp.asarray(voc.stats["mean"])) / jnp.asarray(
                voc.stats["scale"])
            wav = voc_model.apply(voc_params, c)[:, :, 0]
            return (mel, wav)

        f32 = jnp.float32
        specs = [
            jax.ShapeDtypeStruct((1, ts, content_dim), f32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1, ts, 1), f32),
            jax.ShapeDtypeStruct((1, ts, 1), f32),
            jax.ShapeDtypeStruct((1, ts, 1), f32),
            jax.ShapeDtypeStruct((1, tr, content_dim), f32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1, tr, mel_dim), f32),
            jax.ShapeDtypeStruct((1, tr, 1), f32),
            jax.ShapeDtypeStruct((1, tr, 1), f32),
            jax.ShapeDtypeStruct((1, tr, 1), f32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
        ]
        return fn, specs

    files = {}
    # force the XLA attention path for every bucket length while tracing
    # (flash is a trace-time dispatch on jax.default_backend + T)
    old_min_t = attention.FLASH_MIN_T
    attention.FLASH_MIN_T = 1 << 30
    try:
        for ts, tr in buckets:
            fn, specs = make_fn(int(ts), int(tr))
            exported = jexport.export(
                jax.jit(fn), platforms=platforms)(*specs)
            name = _bucket_name(ts, tr)
            path = os.path.join(out_dir, name + ".stablehlo")
            with open(path, "wb") as f:
                f.write(exported.serialize())
            files[name] = os.path.basename(path)
            logger.info("exported %s (%d bytes)", name,
                        os.path.getsize(path))
    finally:
        attention.FLASH_MIN_T = old_min_t

    fc_hop = conv.config.get("hop_size")
    fc_sr = conv.config.get("sampling_rate")
    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "serenade_tpu.converter",
        # feature frame shift in seconds (audio-seconds accounting for
        # the artifact server's /healthz RTF)
        "frame_shift_s": (float(fc_hop) / float(fc_sr)
                          if fc_hop and fc_sr else None),
        "buckets": [[int(ts), int(tr)] for ts, tr in buckets],
        "files": files,
        "platforms": list(platforms),
        "variant_new": bool(variant_new),
        "n_timesteps": int(conv.n_timesteps),
        "solver": solver,
        "temperature": float(conv.temperature),
        "num_mels": mel_dim,
        "content_dim": content_dim,
        "has_vocoder": voc_model is not None,
        "quantize": getattr(conv, "quantize", None),
        "hop_size": hop,
        "sample_rate": (int(voc.sampling_rate) if voc is not None else None),
        "jax_version": __import__("jax").__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedConverter:
    """Run an exported artifact directory: raw features in, mel (+ wav) out.

    Mirrors ``api.Converter.convert_features`` semantics (same padding,
    same normalization — it is baked into the program) without importing
    any model code."""

    def __init__(self, art_dir: str, seed: int = 0):
        import threading

        import jax
        from jax import export as jexport

        with open(os.path.join(art_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("kind") != "serenade_tpu.converter":
            raise ValueError(f"{art_dir} is not a converter artifact")
        backend = jax.default_backend()
        # lowering platform names: jax.export knows cuda/rocm, the runtime
        # backend reports 'gpu'; anything else TPU-like reports as 'tpu'
        aliases = {"gpu": ("gpu", "cuda", "rocm"),
                   "cpu": ("cpu",), "tpu": ("tpu",)}.get(
            backend if backend in ("cpu", "gpu") else "tpu")
        if not any(p in self.manifest["platforms"] for p in aliases):
            raise RuntimeError(
                f"artifact exported for {self.manifest['platforms']}, "
                f"current backend is {backend}")
        self._programs = {}
        for name, fname in self.manifest["files"].items():
            with open(os.path.join(art_dir, fname), "rb") as f:
                self._programs[name] = jexport.deserialize(f.read())
        self._jax = jax
        self._key = jax.random.key(seed)
        # serving may convert from multiple threads; the PRNG chain must
        # advance atomically (same contract as api.Converter._next_key)
        self._key_lock = threading.Lock()

    @property
    def sample_rate(self) -> Optional[int]:
        return self.manifest["sample_rate"]

    def _pick_bucket(self, t_src: int, t_ref: int) -> Tuple[int, int]:
        fits = [(ts, tr) for ts, tr in self.manifest["buckets"]
                if ts >= t_src and tr >= t_ref]
        if not fits:
            raise ValueError(
                f"no exported bucket fits src={t_src}/ref={t_ref} frames "
                f"(buckets: {self.manifest['buckets']})")
        # least total padded work: the packed CFM sequence is ts+tr frames
        return min(fits, key=lambda b: (b[0] + b[1], b[0], b[1]))

    @staticmethod
    def _pad(a, T: int) -> np.ndarray:
        a = np.asarray(a, np.float32)
        if a.ndim == 1:
            a = a[:, None]
        out = np.zeros((1, T, a.shape[1]), np.float32)
        out[0, : min(T, a.shape[0])] = a[:T]
        return out

    def convert_features(
        self, src_feats: Dict[str, np.ndarray],
        ref_feats: Dict[str, np.ndarray],
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[int]]:
        """Raw (un-normalized, h5-layout) feature dicts → (mel, wav, sr).

        src needs hubert/score/loud (+f0_fluc for the modded variant);
        ref additionally logmel."""
        t_src = int(np.asarray(src_feats["hubert"]).shape[0])
        t_ref = int(np.asarray(ref_feats["hubert"]).shape[0])
        ts, tr = self._pick_bucket(t_src, t_ref)
        prog = self._programs[_bucket_name(ts, tr)]

        fluc_s = src_feats.get("f0_fluc")
        fluc_r = ref_feats.get("f0_fluc")
        if self.manifest["variant_new"] and (fluc_s is None or fluc_r is None):
            raise ValueError("modded-variant artifact needs f0_fluc features")
        zeros_s = np.zeros((t_src, 1), np.float32)
        zeros_r = np.zeros((t_ref, 1), np.float32)

        with self._key_lock:
            self._key, sub = self._jax.random.split(self._key)
        key_data = np.asarray(self._jax.random.key_data(sub))
        out = prog.call(
            self._pad(src_feats["hubert"], ts),
            np.asarray([t_src], np.int32),
            self._pad(src_feats["score"], ts),
            self._pad(src_feats["loud"], ts),
            self._pad(fluc_s if fluc_s is not None else zeros_s, ts),
            self._pad(ref_feats["hubert"], tr),
            np.asarray([t_ref], np.int32),
            self._pad(ref_feats["logmel"], tr),
            self._pad(ref_feats["score"], tr),
            self._pad(ref_feats["loud"], tr),
            self._pad(fluc_r if fluc_r is not None else zeros_r, tr),
            key_data,
        )
        mel = np.asarray(out[0])[0, :t_src]
        if self.manifest["has_vocoder"]:
            wav = np.asarray(out[1])[0, : t_src * self.manifest["hop_size"]]
            return mel, wav, self.manifest["sample_rate"]
        return mel, None, None


def load(art_dir: str, seed: int = 0) -> ExportedConverter:
    return ExportedConverter(art_dir, seed=seed)


class ArtifactService:
    """Serve an exported artifact through ``serving.make_server`` — HTTP
    conversion on a host with NO model code, checkpoints, or scaler
    pickles (``serenade-serve --artifact DIR``).

    Duck-types the BatchingConverter surface the HTTP handler uses:
    POST /convert_features and /register_reference work (the exported
    programs are batch-1 — requests run directly, no batching queue) and
    GET /healthz reports stats.  The extraction-dependent endpoints
    (/convert_wav, /convert_stream, /convert_stream_live) fault with a
    clear 400: feature extraction and ContentVec are not part of the
    exported program — serve with ``--expdir`` for those.
    """

    def __init__(self, art_dir: str, seed: int = 0,
                 max_references: int = 64,
                 max_request_seconds: float = 600.0):
        import threading

        self._exp = ExportedConverter(art_dir, seed=seed)
        self._max_references = max_references
        # per-request duration cap, like BatchingConverter's: frames/sec
        # from the manifest's frame shift (None in pre-frame_shift_s
        # manifests → the exported buckets are the only bound)
        self.max_request_seconds = float(max_request_seconds)
        shift = self.manifest.get("frame_shift_s")
        self._max_frames = (int(self.max_request_seconds / float(shift))
                            if shift else None)
        self._lock = threading.Lock()
        self._raw_refs: Dict[str, Dict[str, np.ndarray]] = {}
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "audio_sec": 0.0, "compute_sec": 0.0}

    @property
    def manifest(self) -> dict:
        return self._exp.manifest

    @property
    def converter(self):
        """The streaming handlers grab this first; there is no live
        Converter behind an artifact, so they fault per-request."""
        raise ValueError(
            "streaming endpoints need a live model (serenade-serve "
            "--expdir); the exported artifact serves pre-extracted "
            "features only (/convert_features)")

    # -- reference registry (raw features host-side; normalization is
    # baked into the exported program, so there is nothing to pre-pack) --

    def reference_names(self):
        return sorted(self._raw_refs)

    def register_reference(self, name: str, ref_feats) -> None:
        from serenade_tpu.serving import check_registry_capacity

        feats = {k: np.asarray(v) for k, v in ref_feats.items()}
        self._validate(feats, "ref", with_mel=True)
        with self._lock:  # check+insert atomic (handler threads race)
            check_registry_capacity(self._raw_refs, name,
                                    self._max_references)
            self._raw_refs[name] = feats

    def raw_reference(self, name: str):
        if name not in self._raw_refs:
            raise KeyError(f"unknown reference style {name!r}; "
                           f"registered: {self.reference_names()}")
        return self._raw_refs[name]

    def packed_reference(self, name: str):
        raise ValueError(
            "streaming endpoints are not supported by the artifact "
            "server; serve with --expdir")

    def _validate(self, feats, what: str, with_mel: bool) -> None:
        """The shared submit-time contract, against the manifest's baked
        dimensions (the live server reads them off the scaler)."""
        from serenade_tpu.serving import validate_feature_dict

        validate_feature_dict(
            feats, what, with_mel,
            content_dim=int(self.manifest["content_dim"]),
            num_mels=int(self.manifest["num_mels"]),
            variant_new=bool(self.manifest["variant_new"]),
            max_frames=self._max_frames)

    # -- request paths ---------------------------------------------------

    def convert(self, src_feats, ref, timeout: float = 300.0):
        """(mel, wav|None, sr|None) — the /convert_features contract.
        ``ref`` is a feature dict or a registered style name."""
        import time

        del timeout  # synchronous: the exported program runs inline
        try:
            self._validate(src_feats, "src", with_mel=False)
            if isinstance(ref, str):
                ref = self.raw_reference(ref)
            else:
                self._validate(ref, "ref", with_mel=True)
            t0 = time.perf_counter()
            mel, wav, sr = self._exp.convert_features(src_feats, ref)
            dt = time.perf_counter() - t0
        except Exception:
            with self._lock:
                self.stats["errors"] += 1
            raise
        shift = self.manifest.get("frame_shift_s") or 0.0
        with self._lock:
            self.stats["requests"] += 1
            self.stats["batches"] += 1
            self.stats["compute_sec"] += dt
            self.stats["audio_sec"] += mel.shape[0] * shift
        return mel, wav, sr

    def convert_wav(self, src_wav, sr, ref, timeout: float = 300.0,
                    f0_range=None):
        raise ValueError(
            "/convert_wav needs on-device feature extraction; the "
            "exported artifact serves pre-extracted features only — "
            "serve with --expdir and --contentvec-ckpt for raw audio")

    def close(self, join_timeout: float = 5.0) -> None:
        pass  # no worker threads to stop
