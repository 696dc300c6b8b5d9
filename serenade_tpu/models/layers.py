"""Shared neural building blocks (flax.linen, channels-last).

Design notes (TPU-first, not a port):

* All sequence tensors are ``(B, T, C)`` — channels on the TPU lane axis.
* Convolutions use *explicit torch-equivalent padding* so geometry matches
  the reference architectures exactly (needed for torch-checkpoint
  conversion of the pretrained HiFiGAN vocoder) while staying static-shape.
* Normalization layers compute masked statistics: the reference's GroupNorm
  (decoder.py:66-77) includes padded frames in its mean/var, which makes
  outputs depend on how much padding the batch happened to have.  With
  bucketed static-shape padding that would be amplified, so our GroupNorm
  ignores padding — padding-invariant by construction.
* Weight-normalized convs store ``(v, g)`` exactly like torch's
  ``weight_norm`` parametrization (per-output-channel L2 norm), so torch
  checkpoints convert 1:1.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class QDense(nn.Module):
    """``nn.Dense`` twin whose kernel may arrive QUANTIZED at apply time.

    Used for every 2-D matmul on the UNet estimator's hot path: with an
    ordinary array kernel this is numerically identical to ``nn.Dense``
    (same param names/shapes/init, so checkpoints are interchangeable);
    when the caller substitutes a :class:`serenade_tpu.quantize.QTensor`
    kernel (``quantize.quantize_dense_tree``, the ``int8_compute``
    serving mode), activations quantize dynamically per row and the
    contraction runs int8×int8 on the MXU (``quantize.int8_dot``) —
    weights stay int8 in HBM inside the CFM scan instead of being
    dequantize-hoisted to f32 as in the weight-only mode.
    """

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.lecun_normal())
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from serenade_tpu.quantize import QTensor, int8_dot

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        if isinstance(kernel, QTensor):
            out_dtype = self.dtype or x.dtype
            y = int8_dot(x, kernel, dtype=out_dtype)
            if bias is not None:
                y = y + bias.astype(out_dtype)
            return y
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        y = lax.dot_general(x, kernel,
                            (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


# ---------------------------------------------------------------------------
# convolution primitives
# ---------------------------------------------------------------------------


def default_conv_backend() -> str:
    """'mm' (tap-sum matmuls) on TPU, 'lax' (conv_general_dilated) elsewhere.

    Profiling on v5e (docs/perf notes; bench.py flash_vs_xla sibling run)
    showed XLA's 1-D conv path reshaping (B, T, C) activations into 2-D
    spatial tiles with layout copies around every conv and lowering the
    interleaved leaky_relus to pad+reduce fusions — the HiFiGAN stack ran
    ~10× above its memory-bound floor.  The tap-sum matmul formulation
    keeps activations in the native (8,128)-tiled (T, C) layout, runs each
    kernel tap on the MXU, and lets XLA fuse bias/activation into matmul
    epilogues.  Override with SERENADE_CONV_BACKEND=mm|lax.
    """
    forced = os.environ.get("SERENADE_CONV_BACKEND")
    if forced in ("mm", "lax"):
        return forced
    return "lax" if jax.default_backend() in ("cpu", "gpu") else "mm"


# Measured on v5e (HiFiGAN at 245k samples): mm 12.8 vs lax 9.4 M
# samples/s. At very long extents (≥490k) lax alone is faster than mm
# alone, but MIXING backends inside one model is slower than either
# (layout transitions), so auto stays mm for the whole program; chunk
# long-form audio instead (ops/longform.py).


def _conv1d_lax(x, kernel, bias, stride, dilation, padding):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHC", "HIO", "NHC"))
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias
    return y


def _conv1d_mm(x, kernel, bias, stride, dilation, padding):
    """y[t] = Σ_j x[t·stride + j·dilation] @ W[j] — K strided-slice matmuls
    accumulated in f32."""
    k, cin, cout = kernel.shape
    if padding != (0, 0):
        x = jnp.pad(x, ((0, 0), padding, (0, 0)))
    b, t, _ = x.shape
    span = (k - 1) * dilation + 1
    t_out = (t - span) // stride + 1
    acc = None
    for j in range(k):
        start = j * dilation
        limit = start + (t_out - 1) * stride + 1
        xs = lax.slice_in_dim(x, start, limit, stride, axis=1)
        yj = jnp.einsum("btc,cd->btd", xs, kernel[j],
                        preferred_element_type=jnp.float32)
        acc = yj if acc is None else acc + yj
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


def conv1d(x, kernel, bias=None, *, stride: int = 1, dilation: int = 1,
           padding: Tuple[int, int] = (0, 0), backend: str = "auto"):
    """1-D convolution on ``(B, T, Cin)`` with kernel ``(K, Cin, Cout)``.

    Explicit padding (torch semantics), channels-last.  Two equivalent
    lowerings: 'lax' (XLA conv op) and 'mm' (tap-sum matmuls — the fast
    path on TPU, see ``default_conv_backend``).
    """
    if backend == "auto":
        backend = default_conv_backend()
    if backend == "mm":
        return _conv1d_mm(x, kernel, bias, stride, dilation, padding)
    return _conv1d_lax(x, kernel, bias, stride, dilation, padding)


def _conv_transpose1d_lax(x, kernel, bias, stride, padding, output_padding):
    k = kernel.shape[0]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    flipped = jnp.flip(kernel, axis=0)
    dn = lax.conv_dimension_numbers(x.shape, flipped.shape, ("NHC", "HIO", "NHC"))
    y = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias
    return y


def _conv_transpose1d_mm(x, kernel, bias, stride, padding, output_padding):
    """Phase (subpixel) decomposition: tap j contributes x @ W[j] at output
    positions t·stride + j; group taps by phase j mod stride, pad-shift and
    add within each phase, interleave phases by reshape.  K matmuls, no
    input dilation, activations stay (8,128)-tiled."""
    k, cin, cout = kernel.shape
    b, t, _ = x.shape
    s = stride
    out_len = (t - 1) * s - 2 * padding + k + output_padding
    # uncropped grid; output_padding may extend past the deconv support
    # (those positions are zero, matching torch)
    full_len = (t - 1) * s + k + max(output_padding - padding, 0)
    t_ph = (full_len + s - 1) // s      # per-phase length (common, padded)

    taps = [jnp.einsum("btc,cd->btd", x, kernel[j],
                       preferred_element_type=jnp.float32)
            for j in range(k)]
    phases = []
    for p in range(s):
        acc = None
        for j in range(p, k, s):
            m = j // s
            yj = jnp.pad(taps[j], ((0, 0), (m, t_ph - t - m), (0, 0)))
            acc = yj if acc is None else acc + yj
        if acc is None:
            acc = jnp.zeros((b, t_ph, cout), jnp.float32)
        phases.append(acc)
    # (B, t_ph, s, Cout) -> (B, t_ph*s, Cout): index u = t'*s + p
    full = jnp.stack(phases, axis=2).reshape(b, t_ph * s, cout)
    y = lax.slice_in_dim(full, padding, padding + out_len, axis=1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def conv_transpose1d(x, kernel, bias=None, *, stride: int = 2,
                     padding: int = 1, output_padding: int = 0,
                     backend: str = "auto"):
    """Transposed 1-D conv matching torch ``ConvTranspose1d`` geometry.

    ``out_len = (T - 1) * stride - 2 * padding + K + output_padding``.
    Two equivalent lowerings: 'lax' (input dilation + flipped conv) and
    'mm' (subpixel phase decomposition — the fast path on TPU).

    Kernel layout is ``(K, Cin, Cout)`` (the torch ``(Cin, Cout, K)`` kernel
    transposes into this in the checkpoint converter).
    """
    if backend == "auto":
        backend = default_conv_backend()
    if backend == "mm":
        return _conv_transpose1d_mm(x, kernel, bias, stride, padding,
                                    output_padding)
    return _conv_transpose1d_lax(x, kernel, bias, stride, padding,
                                 output_padding)


def reflect_pad_time(x, pad: int):
    """Reflection-pad the time axis of ``(B, T, C)``."""
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class Conv1d(nn.Module):
    """Plain conv1d with torch-style symmetric integer padding."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    padding: Optional[int] = None  # None => torch "same-ish" (k-1)//2 * dilation
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        pad = self.padding
        if pad is None:
            pad = (self.kernel_size - 1) // 2 * self.dilation
        x = x.astype(self.dtype)
        return conv1d(
            x,
            kernel.astype(self.dtype),
            bias.astype(self.dtype) if bias is not None else None,
            stride=self.stride,
            dilation=self.dilation,
            padding=(pad, pad),
        )


class ConvTranspose1d(nn.Module):
    """Transposed conv1d with torch geometry (see ``conv_transpose1d``)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        return conv_transpose1d(
            x,
            kernel.astype(self.dtype),
            bias.astype(self.dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class WNConv1d(nn.Module):
    """Weight-normalized conv1d (torch ``weight_norm`` parametrization).

    ``kernel = g * v / ||v||`` with the norm over (K, Cin) per output channel
    (reference serenade.py:359). Stored as ``v``/``g`` so torch checkpoints
    (``weight_v``/``weight_g``) map 1:1.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.he_normal(in_axis=(0, 1), out_axis=2),
            (self.kernel_size, cin, self.features),
            self.param_dtype,
        )
        g = self.param("g", nn.initializers.ones, (self.features,), self.param_dtype)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True) + 1e-12)
        kernel = (g * v / norm).astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.dtype)
        return conv1d(
            x,
            kernel,
            bias.astype(self.dtype) if bias is not None else None,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.padding,
        )


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def masked_group_norm(x, mask, scale, bias, *, num_groups: int = 8,
                      epsilon: float = 1e-5, out_dtype=None):
    """Functional masked GroupNorm (see :class:`MaskedGroupNorm`); shared
    by the module and the fused-Block1D fallback path."""
    b, t, c = x.shape
    g = num_groups
    assert c % g == 0, f"channels {c} not divisible by groups {g}"
    xf = x.astype(jnp.float32).reshape(b, t, g, c // g)
    if mask is None:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    else:
        m = mask.astype(jnp.float32).reshape(b, t, 1, 1)
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True) * (c // g), 1.0)
        mean = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / denom
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True) / denom
    y = (xf - mean) * lax.rsqrt(var + epsilon)
    y = y.reshape(b, t, c) * scale + bias
    if mask is not None:
        y = y * mask
    return y.astype(out_dtype if out_dtype is not None else x.dtype)


class MaskedGroupNorm(nn.Module):
    """GroupNorm over (time, channels/group) with padding excluded.

    Statistics are computed in f32 over valid frames only (``mask`` is
    ``(B, T, 1)``), making outputs independent of bucket padding — a
    deliberate improvement over reference decoder.py:71 whose statistics
    include zero padding.
    """

    num_groups: int = 8
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return masked_group_norm(x, mask, scale, bias,
                                 num_groups=self.num_groups,
                                 epsilon=self.epsilon, out_dtype=self.dtype)


class SpeakerAdaLayerNorm(nn.Module):
    """AdaSpeech2-style conditional LayerNorm (reference decoder.py:14-45).

    Per-frame LayerNorm over channels, then scale/bias predicted from the
    style embedding.  Projections init to identity (W=0, scale bias=1).
    """

    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, spk):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon)
        scale = QDense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="w_scale",
        )(spk.astype(jnp.float32))
        bias = QDense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="w_bias",
        )(spk.astype(jnp.float32))
        y = y * scale[:, None, :] + bias[:, None, :]
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """Plain LayerNorm over channels, f32 statistics."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------


def sinusoidal_time_embedding(t, dim: int, scale: float = 1000.0):
    """Sinusoidal embedding of flow time (reference decoder.py:48-63).

    Args:
        t: ``(B,)`` flow times in [0, 1].
        dim: even embedding dimension.
    """
    assert dim % 2 == 0
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP over the sinusoidal embedding (decoder.py:113-157)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = QDense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(emb.astype(self.dtype))
        emb = jax.nn.silu(emb)
        emb = QDense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(emb)
        return emb
