"""Torch Serenade checkpoint → flax params converter.

Maps the reference's released SSC checkpoints (torch pickles with
``{"model": state_dict}``, trainers/base.py:98-111) onto our param tree so
the published 200k-step model runs on TPU (SURVEY §7.4 lists this as a
hard requirement — retraining from scratch is impractical for the release
assets).

Use with ``Serenade(..., gst_norm_type="frozen_batch")``: the GST reference
encoder then applies the checkpoint's BatchNorm running statistics exactly
(our from-scratch training default is padding-invariant masked GroupNorm,
which has no torch counterpart).

Layout conventions converted here:
  torch Conv1d  (out, in, k)   -> flax (k, in, out)
  torch Conv2d  (out, in, kh, kw) -> flax (kh, kw, in, out)
  torch ConvT1d (in, out, k)   -> flax (k, in, out)
  torch Linear  (out, in)      -> flax (in, out)
  weight-norm convs keep (v, g) split (our WNConv1d stores the same
  parametrization); GRU gates r/z/n split into flax GRUCell's six dense
  blocks with the i/h biases merged for r and z.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _linear(sd, prefix):
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _conv1d(sd, prefix):
    p = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _convT1d(sd, prefix):
    p = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 0, 1))}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _conv2d(sd, prefix):
    p = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _wnconv1d(sd, prefix):
    """torch weight_norm Conv1d -> our WNConv1d (v, g, bias)."""
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"]).reshape(-1)
    elif f"{prefix}.parametrizations.weight.original1" in sd:
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"]).reshape(-1)
    else:  # weight norm already removed: fold into v with unit g
        v = _np(sd[f"{prefix}.weight"])
        g = np.sqrt((v**2).sum(axis=(1, 2)))
    p = {"v": np.transpose(v, (2, 1, 0)), "g": g}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _norm(sd, prefix):
    """GroupNorm / LayerNorm weight+bias -> scale+bias."""
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _frozen_bn(sd, prefix):
    return {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _gru(sd, prefix):
    """torch GRU l0 -> flax GRUCell (gate order r, z, n)."""
    w_ih = _np(sd[f"{prefix}.weight_ih_l0"])  # (3H, in)
    w_hh = _np(sd[f"{prefix}.weight_hh_l0"])  # (3H, H)
    b_ih = _np(sd[f"{prefix}.bias_ih_l0"])
    b_hh = _np(sd[f"{prefix}.bias_hh_l0"])
    H = w_hh.shape[1]
    wi = {k: w_ih[i * H:(i + 1) * H].T for i, k in enumerate("rzn")}
    wh = {k: w_hh[i * H:(i + 1) * H].T for i, k in enumerate("rzn")}
    bi = {k: b_ih[i * H:(i + 1) * H] for i, k in enumerate("rzn")}
    bh = {k: b_hh[i * H:(i + 1) * H] for i, k in enumerate("rzn")}
    return {
        # flax folds both biases into the input dense for r and z; the n
        # gate keeps the h-side bias inside tanh's r-gated term like torch
        "ir": {"kernel": wi["r"], "bias": bi["r"] + bh["r"]},
        "iz": {"kernel": wi["z"], "bias": bi["z"] + bh["z"]},
        "in": {"kernel": wi["n"], "bias": bi["n"]},
        "hr": {"kernel": wh["r"]},
        "hz": {"kernel": wh["z"]},
        "hn": {"kernel": wh["n"], "bias": bh["n"]},
    }


def _conv1d_resnet(sd, prefix, num_layers=2):
    p = {"conv_in": _wnconv1d(sd, f"{prefix}.model.1")}
    for n in range(num_layers):
        blk = f"{prefix}.model.{2 + n}"
        p[f"resblock{n}"] = {
            "conv1": _wnconv1d(sd, f"{blk}.block.2"),
            "conv2": _wnconv1d(sd, f"{blk}.block.4"),
            "shortcut": _wnconv1d(sd, f"{blk}.shortcut"),
        }
    p["conv_out"] = _wnconv1d(sd, f"{prefix}.model.{4 + num_layers}")
    return p


def _speaker_adapter(sd, prefix):
    return {"w_scale": _linear(sd, f"{prefix}.W_scale"),
            "w_bias": _linear(sd, f"{prefix}.W_bias")}


def _resnet_block_1d(sd, prefix):
    return {
        "block1": {"conv": _conv1d(sd, f"{prefix}.block1.block.0"),
                   "norm": _norm(sd, f"{prefix}.block1.block.1")},
        "time_mlp": _linear(sd, f"{prefix}.mlp.1"),
        "block2": {"conv": _conv1d(sd, f"{prefix}.block2.block.0"),
                   "norm": _norm(sd, f"{prefix}.block2.block.1")},
        "res_conv": _conv1d(sd, f"{prefix}.res_conv"),
        "speaker_adapter": _speaker_adapter(sd, f"{prefix}.speaker_projection"),
    }


def _transformer_block(sd, prefix):
    return {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn1": {
            "to_q": _linear(sd, f"{prefix}.attn1.to_q"),
            "to_k": _linear(sd, f"{prefix}.attn1.to_k"),
            "to_v": _linear(sd, f"{prefix}.attn1.to_v"),
            "to_out": _linear(sd, f"{prefix}.attn1.to_out.0"),
        },
        "norm3": _norm(sd, f"{prefix}.norm3"),
        "ff": {
            "act": {"proj": _linear(sd, f"{prefix}.ff.net.0.proj")},
            "out": _linear(sd, f"{prefix}.ff.net.2"),
        },
    }


def _unet(sd, prefix, n_levels=2, num_mid_blocks=2, n_blocks=1):
    p: Dict = {
        "time_mlp": {
            "linear_1": _linear(sd, f"{prefix}.time_mlp.linear_1"),
            "linear_2": _linear(sd, f"{prefix}.time_mlp.linear_2"),
        },
        "final_block": {"conv": _conv1d(sd, f"{prefix}.final_block.block.0"),
                        "norm": _norm(sd, f"{prefix}.final_block.block.1")},
        "final_proj": _conv1d(sd, f"{prefix}.final_proj"),
    }
    for i in range(n_levels):
        p[f"down{i}_resnet"] = _resnet_block_1d(sd, f"{prefix}.down_blocks.{i}.0")
        for j in range(n_blocks):
            p[f"down{i}_tx{j}"] = _transformer_block(
                sd, f"{prefix}.down_blocks.{i}.1.{j}")
        p[f"down{i}_downsample"] = _conv1d(sd, f"{prefix}.down_blocks.{i}.2")
    for i in range(num_mid_blocks):
        p[f"mid{i}_resnet"] = _resnet_block_1d(sd, f"{prefix}.mid_blocks.{i}.0")
        for j in range(n_blocks):
            p[f"mid{i}_tx{j}"] = _transformer_block(
                sd, f"{prefix}.mid_blocks.{i}.1.{j}")
    for i in range(n_levels):
        is_last = i == n_levels - 1
        p[f"up{i}_resnet"] = _resnet_block_1d(sd, f"{prefix}.up_blocks.{i}.0")
        for j in range(n_blocks):
            p[f"up{i}_tx{j}"] = _transformer_block(
                sd, f"{prefix}.up_blocks.{i}.1.{j}")
        p[f"up{i}_upsample"] = (
            _conv1d(sd, f"{prefix}.up_blocks.{i}.2") if is_last
            else _convT1d(sd, f"{prefix}.up_blocks.{i}.2")
        )
    return p


def _gst(sd, prefix, conv_layers=6):
    ref = {}
    for i in range(conv_layers):
        ref[f"conv{i}"] = _conv2d(sd, f"{prefix}.ref_enc.convs.{3 * i}")
        ref[f"norm{i}"] = _frozen_bn(sd, f"{prefix}.ref_enc.convs.{3 * i + 1}")
    ref["MaskedGRU_0"] = {"GRUCell_0": _gru(sd, f"{prefix}.ref_enc.gru")}
    stl = {
        "gst_embs": _np(sd[f"{prefix}.stl.gst_embs"]),
        "linear_q": _linear(sd, f"{prefix}.stl.mha.linear_q"),
        "linear_k": _linear(sd, f"{prefix}.stl.mha.linear_k"),
        "linear_v": _linear(sd, f"{prefix}.stl.mha.linear_v"),
        "linear_out": _linear(sd, f"{prefix}.stl.mha.linear_out"),
    }
    return {"ref_enc": ref, "stl": stl}


def convert_serenade(state_dict, num_encoder_layers: int = 2) -> dict:
    """Reference Serenade/SerenadeNew state dict -> flax variables."""
    sd = state_dict
    params = {
        "encoder": _conv1d_resnet(sd, "encoder",
                                  num_layers=num_encoder_layers),
        "gst": _gst(sd, "gst"),
        "cfm_decoder": {"estimator": _unet(sd, "cfm_decoder.estimator")},
    }
    return {"params": params}


def load_torch_serenade_checkpoint(path: str):
    """Load a torch pickle; returns the model state dict (handles both
    {"model": sd} and raw-sd layouts)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        return ckpt["model"]
    return ckpt
