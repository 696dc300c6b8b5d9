"""Feature-dump dataset over per-utterance h5 files.

Counterpart of reference datasets/audio_mel_dataset.py:20-268
(`FeatsDataset`/`FeatsDatasetNew`): finds ``*.h5`` dumps, loads the feature
streams, and applies the fitted scaler contract (z-norm for hubert/logmel,
min-max for score/loud — audio_mel_dataset.py:97-110).

Returns plain numpy dicts; batching/padding is the collater's job, and
device placement happens once per step in the trainer (host→HBM transfer
amortized, not per-utterance).
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import numpy as np

from serenade_tpu.config import register
from serenade_tpu.utils.h5 import find_files, read_hdf5, read_hdf5_many

logger = logging.getLogger(__name__)


def _as_2d(x):
    x = np.asarray(x)
    return x[:, None] if x.ndim == 1 else x


@register("dataset")
class FeatsDataset:
    KEYS = ("wave", "hubert", "logmel", "score", "midi", "loud", "lf0")

    def __init__(
        self,
        root_dir: str,
        scaler=None,
        score_type: str = "est_lf0_score",
        logmel_type: str = "logmel",
        return_utt_id: bool = False,
        query: str = "*.h5",
        allow_cache: bool = False,
        logmel_fallback: bool = False,
        load_keys=None,
    ):
        """``load_keys``: restrict item keys (and their h5 READS) to this
        subset of (wave, hubert, logmel, score, midi, loud, lf0) — the
        training collater only consumes hubert/logmel/score/loud, so the
        train loader skips ~1 MB of dead-weight reads per item (wave is
        the second-largest stream).  None = all keys (decode/eval)."""
        self.files = sorted(find_files(root_dir, query))
        if not self.files:
            raise ValueError(f"no {query} files under {root_dir}")
        self.utt_ids = [
            os.path.splitext(os.path.basename(f))[0] for f in self.files
        ]
        self.scaler = scaler
        self.score_type = score_type
        self.logmel_type = logmel_type
        self.return_utt_id = return_utt_id
        self.logmel_fallback = logmel_fallback
        self.load_keys = tuple(load_keys) if load_keys else None
        self._cache: Dict[int, dict] = {} if allow_cache else None

    def __len__(self):
        return len(self.files)

    def lengths(self, key: str = "hubert"):
        """Frame count per utterance from h5 SHAPE metadata only (no data
        read) — feeds the loader's sort_window batching without paying a
        full item load per index.  ``key`` names the item key whose length
        to report (remapped to its h5 dataset; all streams are
        frame-aligned by preprocessing, so any key gives the same order).
        Cached per key after the first call."""
        h5_name = self._H5_NAMES.get(key, key)
        if key == "logmel":
            h5_name = self.logmel_type
        elif key == "score":
            h5_name = self.score_type
        cache = getattr(self, "_lengths", None)
        if cache is None:
            cache = self._lengths = {}
        if h5_name not in cache:
            from serenade_tpu.utils.h5 import dataset_shape

            out = np.empty(len(self.files), np.int64)
            for i, f in enumerate(self.files):
                # shared metadata cache: this pass also records dataset
                # file offsets, so the first epoch's raw-read fast path
                # (read_hdf5_many) is primed for free
                shape = dataset_shape(f, h5_name)
                if shape is None:
                    raise KeyError(f"{f} has no {h5_name!r} dataset")
                out[i] = shape[0]
            cache[h5_name] = out
        return cache[h5_name]

    # item key -> h5 dataset name (score/logmel/lf0 are remapped)
    _H5_NAMES = {"wave": "wave", "hubert": "hubert", "midi": "midi",
                 "loud": "loud", "lf0": "f0"}

    def _load(self, path: str) -> dict:
        wanted = self.load_keys or ("wave", "hubert", "logmel", "score",
                                    "midi", "loud", "lf0")
        names = {self._H5_NAMES.get(k, k) for k in wanted
                 if k not in ("logmel", "score")}
        if "logmel" in wanted:
            names.add(self.logmel_type)
        if "score" in wanted:
            names.add(self.score_type)
        # ONE file open for all keys (read_hdf5_many): per-key opens are
        # a measurable slice of loader throughput (bench.py::bench_loader)
        raw = read_hdf5_many(path, tuple(names))
        mel = raw.get(self.logmel_type)
        if mel is None and "logmel" in wanted and self.logmel_type != "logmel":
            if self.logmel_fallback:
                # cyclic fine-tuning (logmel_type=cyclic_logmel) evaluates
                # on the ORIGINAL dev dumps, which have no injected cyclic
                # key — their cyclic target is their own mel (identity
                # conversion).  The reference recipe ships this
                # combination too (run.sh:244-267 passes dump/dev with
                # serenade_cyclic.yaml) but its lazy loader only crashes
                # at the first eval.  The fallback is opt-in (dev/eval
                # datasets only): on a TRAIN dump a missing cyclic key
                # means stage-6 injection failed, and silently training
                # on identity targets would hide it.
                mel = read_hdf5(path, "logmel")
        if mel is None and "logmel" in wanted:
            raise KeyError(
                f"{path} has no {self.logmel_type!r} dataset"
                + (" (stage-6 cyclic_logmel injection missing?)"
                   if self.logmel_type != "logmel" else "")
            )
        item = {}
        if "wave" in wanted:
            item["wave"] = np.asarray(raw["wave"])
        if "hubert" in wanted:
            item["hubert"] = _as_2d(raw["hubert"])
        if "logmel" in wanted:
            item["logmel"] = _as_2d(mel)
        if "score" in wanted:
            item["score"] = _as_2d(raw[self.score_type])
        if "midi" in wanted:
            item["midi"] = _as_2d(raw["midi"])
        if "loud" in wanted:
            item["loud"] = _as_2d(raw["loud"])
        if "lf0" in wanted:
            item["lf0"] = _as_2d(raw["f0"])
        if self.scaler is not None:
            s = self.scaler
            # in-place float32 normalization (the arrays are fresh h5
            # reads owned by this call): no 2x-item-size temporaries on
            # the input hot path
            for k in ("logmel", "hubert"):
                if k in item:
                    v = np.asarray(item[k], np.float32)
                    v -= s[k].mean_
                    v /= s[k].scale_
                    item[k] = v
            for k in ("score", "loud"):
                if k in item:
                    v = np.asarray(item[k], np.float32)
                    v -= s[k].data_min_
                    v /= (s[k].data_max_ - s[k].data_min_)
                    item[k] = v
            if "logmel" in item and np.isnan(item["logmel"]).any():
                logger.info("contains nan: %s", path)
        return item

    def __getitem__(self, idx: int):
        if self._cache is not None and idx in self._cache:
            item = self._cache[idx]
        else:
            item = self._load(self.files[idx])
            if self._cache is not None:
                self._cache[idx] = item
        if self.return_utt_id:
            return self.utt_ids[idx], item
        return item


@register("dataset")
class FeatsDatasetNew(FeatsDataset):
    """Adds the F0-fluctuation stream (reference audio_mel_dataset.py:144)."""

    def _load(self, path: str) -> dict:
        item = super()._load(path)
        if self.load_keys is None or "f0_fluc" in self.load_keys:
            item["f0_fluc"] = _as_2d(read_hdf5(path, "f0_fluc"))
        return item
