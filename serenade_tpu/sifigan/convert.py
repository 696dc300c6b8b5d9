"""Torch SiFiGAN checkpoint → flax params converter.

The reference loads the external ``sifigan`` package's generator from a
torch pickle (``{"model": {"generator": state_dict}}``,
serenade/bin/ssc_postprocessing.py:92-99).  This maps that state dict onto
our ``SiFiGANGenerator`` (generator.py), folding weight norm exactly like
the HiFiGAN converter (vocoder/convert.py):

* torch Conv1d ``(Cout, Cin, K)`` → flax ``(K, Cin, Cout)``;
* torch ConvTranspose1d ``(Cin, Cout, K)`` → flax ``(K, Cin, Cout)``;
* convs inside ``nn.Sequential`` wrappers are located at any index, so
  activation-placement differences in the packaged module cannot break
  key lookup;
* every consumed key is tracked — leftovers raise with a listing so a
  mapping gap is loud, not silent.

Validated end to end against the in-repo torch twin (torch_twin.py) in
tests/test_sifigan_convert.py.
"""

from __future__ import annotations

from typing import Dict

from serenade_tpu.vocoder.convert import (
    _bias, _conv_kernel, _deconv_kernel,
)


class _TrackingDict(dict):
    """Records which torch keys were read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.used = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key)


def _locate(sd, prefix: str) -> str:
    """Resolve the conv-parameter prefix, looking inside Sequential
    wrappers (index 0-2) when the bare prefix has no weight."""
    for cand in (prefix, f"{prefix}.0", f"{prefix}.1", f"{prefix}.2"):
        if f"{cand}.weight" in sd or f"{cand}.weight_v" in sd:
            return cand
    raise KeyError(
        f"no conv parameters under '{prefix}' "
        f"(available: {sorted(k for k in sd if k.startswith(prefix))})"
    )


def _conv(sd, prefix):
    p = _locate(sd, prefix)
    out = {"kernel": _conv_kernel(sd, p)}
    if f"{p}.bias" in sd:
        out["bias"] = _bias(sd, p)
    return out


def _deconv(sd, prefix):
    p = _locate(sd, prefix)
    out = {"kernel": _deconv_kernel(sd, p)}
    if f"{p}.bias" in sd:
        out["bias"] = _bias(sd, p)
    return out


def convert_sifigan_generator(state_dict: Dict, model) -> Dict:
    """Map a torch SiFiGAN generator state dict onto flax params for
    ``model`` (a ``SiFiGANGenerator`` or ``SiFiGANDirectGenerator``).

    The Direct variant is recognized by the model class: it adds the
    ``fn.emb`` excitation-embedding conv and always has its own filter
    downsamples (sifigan.direct.yaml has no ``share_downsamples``)."""
    sd = _TrackingDict({k: v for k, v in state_dict.items()})
    n_up = len(model.upsample_scales)
    n_blocks = len(model.filter_resblock_kernel_sizes)
    # Direct has no share_downsamples field (and adds fn_emb)
    direct = not hasattr(model, "share_downsamples")

    params: Dict = {"input_conv": _conv(sd, "input_conv")}
    params["sn_emb"] = _conv(sd, "sn.emb")
    if direct:
        params["fn_emb"] = _conv(sd, "fn.emb")
    params["sn_output_conv"] = _conv(sd, "sn.output_conv")
    params["fn_output_conv"] = _conv(sd, "fn.output_conv")

    for i in range(n_up):
        params[f"sn_up{i}"] = _deconv(sd, f"sn.upsamples.{i}")
        if not model.share_upsamples:
            params[f"fn_up{i}"] = _deconv(sd, f"fn.upsamples.{i}")

        block = {}
        for j in range(len(model.source_resblock_dilations[i])):
            block[f"convC{j}"] = _conv(sd, f"sn.blocks.{i}.convsC.{j}")
            block[f"convP{j}"] = _conv(sd, f"sn.blocks.{i}.convsP.{j}")
            block[f"convF{j}"] = _conv(sd, f"sn.blocks.{i}.convsF.{j}")
            if model.source_use_additional_convs:
                block[f"convA{j}"] = _conv(sd, f"sn.blocks.{i}.convsA.{j}")
        params[f"sn_block{i}"] = block

        for j in range(n_blocks):
            flat = i * n_blocks + j
            fblock = {}
            for d in range(len(model.filter_resblock_dilations[j])):
                fblock[f"conv1_{d}"] = _conv(
                    sd, f"fn.blocks.{flat}.convs1.{d}")
                if model.filter_use_additional_convs:
                    fblock[f"conv2_{d}"] = _conv(
                        sd, f"fn.blocks.{flat}.convs2.{d}")
            params[f"fn_block{i}_{j}"] = fblock

    for i in range(n_up - 1):
        params[f"sn_down{i}"] = _conv(sd, f"sn.downsamples.{i}")
        if direct or not model.share_downsamples:
            params[f"fn_down{i}"] = _conv(sd, f"fn.downsamples.{i}")

    leftovers = [k for k in sd if k not in sd.used
                 and not k.endswith("num_batches_tracked")]
    if leftovers:
        raise ValueError(
            "unconsumed torch keys (naming drift?): "
            + ", ".join(sorted(leftovers)[:40])
        )
    return {"params": params}


def load_sifigan_checkpoint(path: str, model):
    """Load a torch SiFiGAN pickle and convert to flax params.

    Accepts the official trainer layout ``{"model": {"generator": sd}}``
    as well as a bare generator state dict.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict):
        sd = ckpt.get("model", ckpt)
        if isinstance(sd, dict) and "generator" in sd:
            sd = sd["generator"]
    sd = {k: v for k, v in sd.items()}
    return convert_sifigan_generator(sd, model)
