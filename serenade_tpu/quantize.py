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

Beyond-parity subsystem: the reference has no quantization story
(fp32 torch checkpoints only, /root/reference/serenade/bin/ssc_decode.py:284-341).
Surfaces: ``api.Converter(quantize="int8")``, ``serenade-serve
--quantize int8``, ``serenade-export --quantize int8`` (int8 constants in
the StableHLO artifact: ~4x smaller on disk), and a bench detail
(``conversion_rtf_int8_weights``).  Quality is quantified on a trained
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
