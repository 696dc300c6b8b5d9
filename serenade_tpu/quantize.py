"""Weight-only int8 quantization for inference serving.

Per-output-channel symmetric int8 quantization of the large weight
matrices; activations, normalization parameters, and all compute stay
bf16/f32.  The quantized tree is a pytree (:class:`QTensor` leaves), so
it passes through ``jit`` boundaries like ordinary params and
dequantizes *inside* the program.

What it buys (measured, BASELINE.md): ~4x smaller exported StableHLO
artifacts (int8 constants), ~4x smaller device-resident params and
checkpoint->device transfer.  What it does NOT buy at conversion shapes:
step time — the CFM ODE is a ``lax.scan``, the dequant is loop-invariant,
and XLA hoists it out of the loop, materializing f32 weights once
(bench: 0.0035 int8 vs 0.0034 f32 RTF, within tunnel noise).

The int8 COMPUTE mode (``quantize_dense_tree`` + ``int8_dot``, mode
string ``int8_compute``) goes further: the estimator's 2-D matmul
kernels stay int8 IN the program — activations quantize dynamically per
row and the MXU contracts int8×int8 with an int32 accumulator (2× the
bf16 FLOP rate, and half the weight HBM traffic inside the CFM scan,
where batch-1 decode is weight-bound).  Nothing is hoistable because the
weights are consumed as int8 by the matmul itself.  Convs, norms, and
the GST/encoder towers stay float.

Beyond-parity subsystem: the reference has no quantization story
(fp32 torch checkpoints only, /root/reference/serenade/bin/ssc_decode.py:284-341).
Surfaces: ``api.Converter(quantize="int8"|"int8_compute")``,
``serenade-serve --quantize ...``, ``serenade-export --quantize int8``
(int8 constants in the StableHLO artifact: ~4x smaller on disk), and
bench details (``conversion_rtf_int8_weights``,
``conversion_rtf_int8_compute``).  Quality is quantified on a trained
checkpoint in tests/test_quantize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Leaves smaller than this stay in float: norms/biases/embedding tables
# contribute nothing to HBM traffic but are quantization-sensitive.
MIN_QUANT_SIZE = 4096


@jax.tree_util.register_pytree_node_class
class QTensor:
    """int8 weights + per-channel f32 scales (symmetric, zero-point 0).

    ``scale`` keeps the original rank with size-1 axes everywhere except
    the channel (last) axis, so ``q * scale`` broadcasts back to the
    weight's shape.
    """

    __slots__ = ("q", "scale")

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # what it dequantizes to (for shape/dtype probes)
        return jnp.float32

    def dequantize(self, dtype=jnp.float32):
        return self.q.astype(dtype) * self.scale.astype(dtype)

    def __repr__(self):
        return f"QTensor(shape={tuple(self.q.shape)}, int8)"


def _is_qtensor(x) -> bool:
    return isinstance(x, QTensor)


def _eligible(leaf) -> bool:
    if isinstance(leaf, QTensor):
        return False  # already quantized
    # numpy arrays expose dtype/ndim/size directly — converting to a
    # device array just to inspect them would upload the whole leaf
    if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype,
                                                        jnp.floating):
        return False
    return leaf.ndim >= 2 and leaf.size >= MIN_QUANT_SIZE


def quantize_leaf(w) -> QTensor:
    """Symmetric per-last-axis-channel int8 quantization of one weight.
    Flax kernels put the output channel last (Dense: (in, out), Conv:
    (k, in, out)), so 'per output channel' == per last axis."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)),
                     keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale.astype(jnp.float32))


def quantize_tree(params):
    """Quantize every eligible weight leaf (floating, ndim>=2, size >=
    MIN_QUANT_SIZE) to a :class:`QTensor`; everything else passes through
    untouched.  Runs under jit-able ops, so call it once at load time."""
    return jax.tree_util.tree_map(
        lambda l: quantize_leaf(l) if _eligible(l) else l, params)


def int8_dot(x, qt: QTensor, dtype=jnp.float32):
    """int8×int8 MXU contraction against a quantized 2-D kernel.

    Activations are quantized DYNAMICALLY per row (symmetric, per-last-
    axis absmax), the contraction runs int8×int8 with an int32
    accumulator (the TPU MXU's native int8 mode — 2× the bf16 FLOP rate,
    and the kernel stays int8 in HBM, halving the weight traffic that
    dominates batch-1 decode), then the result is rescaled by
    ``act_scale ⊗ weight_scale``.  Unlike weight-only int8 (where XLA
    hoists the loop-invariant dequantize out of the CFM scan and
    materializes f32 weights), nothing here is hoistable: the weights are
    consumed as int8 by the matmul itself.
    """
    assert qt.q.ndim == 2, f"int8_dot wants a 2-D kernel, got {qt.q.shape}"
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, qt.q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w_scale = qt.scale.reshape((1,) * (y.ndim - 1) + (-1,))
    return (y.astype(jnp.float32) * s_x * w_scale).astype(dtype)


def quantize_dense_tree(params, subtree: str = "estimator",
                        min_size: int = MIN_QUANT_SIZE):
    """The int8-COMPUTE serving mode: quantize ONLY the 2-D ``kernel``
    leaves under ``subtree`` — exactly the matmuls the UNet estimator
    routes through :class:`models.layers.QDense`, which detects QTensor
    kernels at apply time and runs :func:`int8_dot`.  Everything else
    (convs, norms, biases, the GST/encoder towers) stays float, so the
    tree applies WITHOUT ``dequantize_tree``.
    """
    def maybe(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if subtree not in keys or keys[-1] != "kernel":
            return leaf
        if not _eligible(leaf) or leaf.ndim != 2 or leaf.size < min_size:
            return leaf
        return quantize_leaf(leaf)

    return jax.tree_util.tree_map_with_path(maybe, params)


def dequantize_tree(params, dtype=jnp.float32):
    """Rebuild a float tree from a (possibly partially) quantized one.
    Identity on unquantized trees — safe to call unconditionally at the
    top of a jitted program; inside jit the int8 -> float multiply fuses
    into each weight's consumer."""
    return jax.tree_util.tree_map(
        lambda l: l.dequantize(dtype) if _is_qtensor(l) else l,
        params, is_leaf=_is_qtensor)


def quantized_bytes(params) -> int:
    """Total parameter bytes as stored (int8 + scales for QTensors)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=_is_qtensor):
        if _is_qtensor(leaf):
            total += leaf.q.size + leaf.scale.size * 4
        else:
            a = jnp.asarray(leaf)
            total += a.size * a.dtype.itemsize
    return total
