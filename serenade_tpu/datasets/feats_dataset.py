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
from serenade_tpu.utils.h5 import find_files, hdf5_has, read_hdf5

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
    ):
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
        self._cache: Dict[int, dict] = {} if allow_cache else None

    def __len__(self):
        return len(self.files)

    def _load(self, path: str) -> dict:
        if (self.logmel_type != "logmel" and self.logmel_fallback
                and not hdf5_has(path, self.logmel_type)):
            # cyclic fine-tuning (logmel_type=cyclic_logmel) evaluates on
            # the ORIGINAL dev dumps, which have no injected cyclic key —
            # their cyclic target is their own mel (identity conversion).
            # The reference recipe ships this combination too
            # (run.sh:244-267 passes dump/dev with serenade_cyclic.yaml)
            # but its lazy loader only crashes at the first eval.  The
            # fallback is opt-in (dev/eval datasets only): on a TRAIN dump
            # a missing cyclic key means stage-6 injection failed, and
            # silently training on identity targets would hide it.
            mel = read_hdf5(path, "logmel")
        else:
            mel = read_hdf5(path, self.logmel_type)
        if mel is None:
            raise KeyError(
                f"{path} has no {self.logmel_type!r} dataset"
                + (" (stage-6 cyclic_logmel injection missing?)"
                   if self.logmel_type != "logmel" else "")
            )
        item = {
            "wave": np.asarray(read_hdf5(path, "wave")),
            "hubert": _as_2d(read_hdf5(path, "hubert")),
            "logmel": _as_2d(mel),
            "score": _as_2d(read_hdf5(path, self.score_type)),
            "midi": _as_2d(read_hdf5(path, "midi")),
            "loud": _as_2d(read_hdf5(path, "loud")),
            "lf0": _as_2d(read_hdf5(path, "f0")),
        }
        if self.scaler is not None:
            s = self.scaler
            item["logmel"] = (item["logmel"] - s["logmel"].mean_) / s["logmel"].scale_
            item["hubert"] = (item["hubert"] - s["hubert"].mean_) / s["hubert"].scale_
            item["score"] = (item["score"] - s["score"].data_min_) / (
                s["score"].data_max_ - s["score"].data_min_
            )
            item["loud"] = (item["loud"] - s["loud"].data_min_) / (
                s["loud"].data_max_ - s["loud"].data_min_
            )
            if np.isnan(item["logmel"]).any():
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
        item["f0_fluc"] = _as_2d(read_hdf5(path, "f0_fluc"))
        return item
