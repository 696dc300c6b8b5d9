"""Kaldi wav.scp-backed audio dataset.

Counterpart of reference datasets/dataset.py:48-143 (`AudioSCPDataset`,
kaldiio-backed).  kaldiio isn't needed: wav.scp lines are ``utt_id path``
(optionally with a trailing '|' command, which we reject explicitly), and an
optional Kaldi segments file (``seg_id utt_id start end``) carves
sub-utterances.  PCM is normalized to [-1, 1] on read.
"""

from __future__ import annotations

import logging
from typing import Optional

from serenade_tpu.utils.audio import read_wav, to_mono

logger = logging.getLogger(__name__)


class AudioSCPDataset:
    def __init__(
        self,
        wav_scp: str,
        segments: Optional[str] = None,
        return_utt_id: bool = True,
        min_length: Optional[int] = None,
        max_length: Optional[int] = None,
    ):
        self.entries = []
        with open(wav_scp) as f:
            wav_map = {}
            for line in f:
                parts = line.strip().split(maxsplit=1)
                if not parts:
                    continue
                utt_id, path = parts
                if path.endswith("|"):
                    raise ValueError(
                        "pipe-style wav.scp entries are not supported; "
                        f"materialize the wav first: {line.strip()}"
                    )
                wav_map[utt_id] = path

        if segments is not None:
            with open(segments) as f:
                for line in f:
                    seg_id, utt_id, start, end = line.strip().split()
                    self.entries.append(
                        (seg_id, wav_map[utt_id], float(start), float(end))
                    )
        else:
            self.entries = [(u, p, None, None) for u, p in wav_map.items()]

        self.return_utt_id = return_utt_id
        self.min_length = min_length
        self.max_length = max_length

    def __len__(self):
        return len(self.entries)

    @property
    def utt_ids(self):
        return [e[0] for e in self.entries]

    def __getitem__(self, idx: int):
        utt_id, path, start, end = self.entries[idx]
        audio, fs = read_wav(path)
        audio = to_mono(audio)
        if start is not None:
            audio = audio[int(start * fs):int(end * fs)]
        if self.min_length and len(audio) < self.min_length:
            logger.warning("utt %s shorter than min_length", utt_id)
        if self.max_length and len(audio) > self.max_length:
            audio = audio[: self.max_length]
        if self.return_utt_id:
            return utt_id, (audio, fs)
        return audio, fs

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
