"""Torch HiFiGAN checkpoint → flax params converter.

The released GTSinger vocoder ships as a torch pickle
(`vocoder.pkl` with config/stats beside it, conf/serenade.yaml:42-45).
This converter maps its state dict onto ``HiFiGANGenerator`` params:

* weight norm is folded: ``w = g * v / ||v||`` (per out-channel norm over
  (in, k)), matching the reference's own ``remove_weight_norm()`` before
  inference (vocoder/vocoder.py:38);
* torch Conv1d kernels ``(Cout, Cin, K)`` → flax ``(K, Cin, Cout)``;
* torch ConvTranspose1d kernels ``(Cin, Cout, K)`` → flax ``(K, Cin, Cout)``
  (our ConvTranspose1d flips internally to match torch geometry).

Runs torch on CPU only; torch never touches the TPU path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _fold_weight_norm(sd: Dict, prefix: str) -> np.ndarray:
    """Return the effective torch weight for a (possibly weight-normed)
    conv parameter prefix."""
    if f"{prefix}.weight" in sd:
        return sd[f"{prefix}.weight"].detach().cpu().numpy()
    g = sd[f"{prefix}.weight_g"].detach().cpu().numpy()
    v = sd[f"{prefix}.weight_v"].detach().cpu().numpy()
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv_kernel(sd, prefix):
    w = _fold_weight_norm(sd, prefix)  # (Cout, Cin, K)
    return np.transpose(w, (2, 1, 0)).astype(np.float32)


def _deconv_kernel(sd, prefix):
    w = _fold_weight_norm(sd, prefix)  # (Cin, Cout, K)
    return np.transpose(w, (2, 0, 1)).astype(np.float32)


def _bias(sd, prefix):
    return sd[f"{prefix}.bias"].detach().cpu().numpy().astype(np.float32)


def convert_hifigan_generator(state_dict: Dict, *, num_upsamples: int = 4,
                              num_blocks: int = 3,
                              resblock_dilations=((1, 3, 5),) * 3,
                              use_additional_convs: bool = True) -> Dict:
    """Map a reference HiFiGANGenerator state dict (module names from
    hifigan.py:71-190) to our flax param tree."""
    sd = state_dict
    params: Dict = {}
    params["input_conv"] = {
        "kernel": _conv_kernel(sd, "input_conv"),
        "bias": _bias(sd, "input_conv"),
    }
    for i in range(num_upsamples):
        params[f"upsample_{i}"] = {
            "kernel": _deconv_kernel(sd, f"upsamples.{i}.1"),
            "bias": _bias(sd, f"upsamples.{i}.1"),
        }
        for j in range(num_blocks):
            flat = i * num_blocks + j
            block_params = {}
            for d in range(len(resblock_dilations[j])):
                block_params[f"conv1_{d}"] = {
                    "kernel": _conv_kernel(sd, f"blocks.{flat}.convs1.{d}.1"),
                    "bias": _bias(sd, f"blocks.{flat}.convs1.{d}.1"),
                }
                if use_additional_convs:
                    block_params[f"conv2_{d}"] = {
                        "kernel": _conv_kernel(sd, f"blocks.{flat}.convs2.{d}.1"),
                        "bias": _bias(sd, f"blocks.{flat}.convs2.{d}.1"),
                    }
            params[f"block_{i}_{j}"] = block_params
    params["output_conv"] = {
        "kernel": _conv_kernel(sd, "output_conv.1"),
        "bias": _bias(sd, "output_conv.1"),
    }
    return {"params": params}


def load_torch_vocoder_checkpoint(path: str) -> Dict:
    """Load the torch pickle and return the generator state dict
    (reference checkpoints store {'model': {'generator': ...}})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        model = ckpt["model"]
        if isinstance(model, dict) and "generator" in model:
            return model["generator"]
        return model
    return ckpt
