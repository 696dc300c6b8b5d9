"""Pallas TPU flash-attention kernel (forward).

Blockwise online-softmax attention that never materializes the (T, T)
score matrix in HBM: for each query block the kernel streams key/value
blocks through VMEM, maintaining running max / normalizer / accumulator in
scratch.  Matmuls hit the MXU in f32 accumulation; the padded-key mask is
applied as a -inf bias.

Used for the UNet self-attention at decode time (sequences up to ~6k
frames after reference+source packing, head_dim 512).  Training takes the
XLA einsum path (the custom VJP below recomputes attention under autodiff
for the backward, trading FLOPs for not having a handwritten bwd kernel
yet).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (bq, D)
    k = k_ref[0, 0]  # (bk, D)
    v = v_ref[0, 0]  # (bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk)
    key_mask = mask_ref[0, 0]  # (bk,)
    s = s + (1.0 - key_mask.astype(jnp.float32))[None, :] * _NEG_INF

    m_prev = m_scr[:, :1]                      # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                     # (bq, bk)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * corr + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0, 0] = (
            acc_scr[:] / jnp.maximum(l_scr[:, :1], 1e-30)
        ).astype(o_ref.dtype)


def _flash_forward(q, k, v, key_mask, scale: float, block_q: int,
                   block_k: int, interpret: bool):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)

    # pad sequence lengths to block multiples; padded keys are masked off
    pad_q = (-tq) % block_q
    pad_k = (-tk) % block_k
    if key_mask is None:
        key_mask = jnp.ones((b, tk), jnp.float32)
    key_mask = key_mask.astype(jnp.float32)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_k)))
    tq_p, tk_p = tq + pad_q, tk + pad_k
    nq, nk = tq_p // block_q, tk_p // block_k

    grid = (b, h, nq, nk)
    # (B, 1, Tk) layout keeps the mask's trailing-two block dims legal for
    # the TPU lowering at any batch size
    key_mask3 = key_mask[:, None, :]
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b_, h_, qi, ki: (b_, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, qi, ki: (b_, h_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, qi, ki: (b_, h_, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(key_mask3, q, k, v)
    return out[:, :, :tq, :]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def flash_attention_pallas(q, k, v, key_mask, scale: float,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool = False):
    """Flash attention. q,k,v: (B,H,T,D); key_mask: (B,Tk) 1=valid or None."""
    return _flash_forward(q, k, v, key_mask, scale, block_q, block_k,
                          interpret)


def _xla_reference(q, k, v, key_mask, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = s + (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _fwd(q, k, v, key_mask, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, key_mask, scale, block_q, block_k,
                         interpret)
    return out, (q, k, v, key_mask)


def _bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v, key_mask = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, key_mask,
                                                       scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention_pallas.defvjp(_fwd, _bwd)
