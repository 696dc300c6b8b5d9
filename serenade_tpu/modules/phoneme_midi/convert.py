"""Torch `midi_model.pt` state dict → flax TranscriptionModel params."""

from __future__ import annotations

import numpy as np


def _np(t):
    return t.detach().cpu().numpy()


def _conv2d(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (out, in, kh, kw)
    p = {"kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32)}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return p


def _bn(sd, prefix):
    return {
        "mean": _np(sd[f"{prefix}.running_mean"]).astype(np.float32),
        "var": _np(sd[f"{prefix}.running_var"]).astype(np.float32),
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _dense(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T.astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _conv_stack(sd, prefix):
    # torch Sequential indices: 0 conv, 1 bn, 3/4... see subnetworks.py:5-77
    return {
        "conv0": _conv2d(sd, f"{prefix}.cnn.0"),
        "bn0": _bn(sd, f"{prefix}.cnn.1"),
        "conv1": _conv2d(sd, f"{prefix}.cnn.3"),
        "bn1": _bn(sd, f"{prefix}.cnn.4"),
        "conv2": _conv2d(sd, f"{prefix}.cnn.8"),
        "bn2": _bn(sd, f"{prefix}.cnn.9"),
        "fc": _dense(sd, f"{prefix}.fc.0"),
    }


def _bilstm(sd, prefix):
    out = {}
    for direction, suffix in (("fw", ""), ("bw", "_reverse")):
        out[f"{direction}_w_ih"] = _np(
            sd[f"{prefix}.rnn.weight_ih_l0{suffix}"]
        ).T.astype(np.float32)
        out[f"{direction}_w_hh"] = _np(
            sd[f"{prefix}.rnn.weight_hh_l0{suffix}"]
        ).T.astype(np.float32)
        out[f"{direction}_b"] = (
            _np(sd[f"{prefix}.rnn.bias_ih_l0{suffix}"])
            + _np(sd[f"{prefix}.rnn.bias_hh_l0{suffix}"])
        ).astype(np.float32)
    return out


def convert_transcription_model(state_dict, config) -> dict:
    sd = state_dict
    params = {
        "lang_model": {
            "conv_stack": _conv_stack(sd, "lang_model.conv_stack"),
            "rnn": _bilstm(sd, "lang_model.rnn"),
            "fc": _dense(sd, "lang_model.fc"),
        },
        "lang_conv_stack": _conv_stack(sd, "lang_conv_stack"),
        "lang_rnn": _bilstm(sd, "lang_rnn"),
        "pitch_conv_stack": _conv_stack(sd, "pitch_conv_stack"),
        "pitch_rnn": _bilstm(sd, "pitch_rnn"),
        "combined_rnn": _bilstm(sd, "combined_rnn"),
        "combined_fc": _dense(sd, "combined_fc"),
    }
    return {"params": params}
