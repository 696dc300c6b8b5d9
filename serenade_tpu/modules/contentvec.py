"""ContentVec / HuBERT content-feature encoder (flax, TPU-native).

The reference extracts 768-d content features with a torch HF checkpoint
("lengyue233/content-vec-best") patched so the final feature-extractor conv
has stride 1 — 10 ms frames instead of 20 ms (preprocess.py:361-368).  Here
the same architecture is native flax (conv feature extractor → feature
projection → conv-positional-embedding transformer, HuBERT-base layout) so
extraction runs jitted on TPU; ``convert_hf_hubert`` maps a torch HuBERT
state dict onto the param tree when the pretrained weights are available
on disk.

``last_conv_stride=1`` reproduces the reference's stride hack.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from serenade_tpu.models.layers import LayerNorm


# HuBERT-base feature extractor: (dim, kernel, stride) per conv layer
_FE_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
              (512, 3, 2), (512, 2, 2), (512, 2, 2))


class FeatureExtractor(nn.Module):
    last_conv_stride: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T) waveform -> (B, T', 512)
        h = x[..., None].astype(self.dtype)
        n = len(_FE_LAYERS)
        for i, (dim, k, s) in enumerate(_FE_LAYERS):
            if i == n - 1:
                s = self.last_conv_stride
            h = nn.Conv(dim, kernel_size=(k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="gn")(h)
            h = nn.gelu(h, approximate=False)
        return h


class TransformerLayer(nn.Module):
    """Post-LN transformer layer (HuBERT base, do_stable_layer_norm=False)."""

    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, out_features=self.dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(x, x)
        x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                      name="ln1")(x + h)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(h)
        return LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="ln2")(x + h)


class ContentVecEncoder(nn.Module):
    dim: int = 768
    num_layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    last_conv_stride: int = 1
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """wav: (B, T) 16 kHz in [-1, 1] -> (B, T/160, 768) with the stride
        hack (10 ms frames)."""
        feats = FeatureExtractor(
            last_conv_stride=self.last_conv_stride, dtype=self.dtype,
            param_dtype=self.param_dtype, name="feature_extractor",
        )(wav)
        h = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                      name="fp_ln")(feats)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fp_proj")(h)

        # convolutional positional embedding (grouped conv + gelu, residual)
        pad = self.pos_conv_kernel // 2
        pos = nn.Conv(self.dim, kernel_size=(self.pos_conv_kernel,),
                      padding=[(pad, pad)],
                      feature_group_count=self.pos_conv_groups,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="pos_conv")(h)
        if self.pos_conv_kernel % 2 == 0:
            pos = pos[:, :-1, :]
        h = h + nn.gelu(pos, approximate=False)
        h = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                      name="enc_ln")(h)
        for i in range(self.num_layers):
            h = TransformerLayer(
                dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer{i}",
            )(h)
        return h


def convert_hf_hubert(state_dict) -> dict:
    """Map a torch HF ``HubertModel`` state dict onto ContentVecEncoder
    params (weight-norm of pos_conv folded)."""
    import numpy as np

    def t(name):
        return state_dict[name].detach().cpu().numpy()

    p: dict = {"feature_extractor": {}}
    for i in range(len(_FE_LAYERS)):
        w = t(f"feature_extractor.conv_layers.{i}.conv.weight")  # (out,in,k)
        p["feature_extractor"][f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 1, 0)).astype(np.float32)
        }
    p["feature_extractor"]["gn"] = {
        "scale": t("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": t("feature_extractor.conv_layers.0.layer_norm.bias"),
    }
    p["fp_ln"] = {
        "scale": t("feature_projection.layer_norm.weight"),
        "bias": t("feature_projection.layer_norm.bias"),
    }
    p["fp_proj"] = {
        "kernel": t("feature_projection.projection.weight").T,
        "bias": t("feature_projection.projection.bias"),
    }
    # pos conv stores torch weight norm (new parametrizations API or the
    # legacy weight_g/weight_v names, depending on torch version)
    if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in state_dict:
        g = t("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
        v = t("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    else:
        g = t("encoder.pos_conv_embed.conv.weight_g")
        v = t("encoder.pos_conv_embed.conv.weight_v")
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (out, in/groups, k)
    p["pos_conv"] = {
        "kernel": np.transpose(w, (2, 1, 0)).astype(np.float32),
        "bias": t("encoder.pos_conv_embed.conv.bias"),
    }
    p["enc_ln"] = {
        "scale": t("encoder.layer_norm.weight"),
        "bias": t("encoder.layer_norm.bias"),
    }
    for i in range(12):
        pre = f"encoder.layers.{i}"
        heads, dim = 12, 768
        hd = dim // heads

        def dense_qkv(name):
            w = t(f"{pre}.attention.{name}.weight").T  # (in, out)
            b = t(f"{pre}.attention.{name}.bias")
            return {"kernel": w.reshape(dim, heads, hd),
                    "bias": b.reshape(heads, hd)}

        p[f"layer{i}"] = {
            "attn": {
                "query": dense_qkv("q_proj"),
                "key": dense_qkv("k_proj"),
                "value": dense_qkv("v_proj"),
                "out": {
                    "kernel": t(f"{pre}.attention.out_proj.weight").T.reshape(
                        heads, hd, dim
                    ),
                    "bias": t(f"{pre}.attention.out_proj.bias"),
                },
            },
            "ln1": {"scale": t(f"{pre}.layer_norm.weight"),
                    "bias": t(f"{pre}.layer_norm.bias")},
            "fc1": {"kernel": t(f"{pre}.feed_forward.intermediate_dense.weight").T,
                    "bias": t(f"{pre}.feed_forward.intermediate_dense.bias")},
            "fc2": {"kernel": t(f"{pre}.feed_forward.output_dense.weight").T,
                    "bias": t(f"{pre}.feed_forward.output_dense.bias")},
            "ln2": {"scale": t(f"{pre}.final_layer_norm.weight"),
                    "bias": t(f"{pre}.final_layer_norm.bias")},
        }
    return {"params": p}
