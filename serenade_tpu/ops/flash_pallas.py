"""Pallas TPU flash attention: forward and backward kernels.

Blockwise online-softmax attention that never materializes the (T, T)
score matrix in HBM, with a full custom VJP:

* forward: streams K/V blocks through VMEM per query block, maintaining
  running max / normalizer / accumulator in scratch; also emits the row
  logsumexp ``L`` needed by the backward.
* backward: two kernels — dQ (query blocks outer, key blocks inner) and
  dK/dV (key blocks outer, query blocks inner) — recomputing probabilities
  blockwise from (q, k, L) instead of storing them (the flash-attention-2
  scheme).  The elementwise row term ``D = rowsum(dO ∘ O)`` is a cheap XLA
  op outside the kernels.

All matmuls run on the MXU with f32 accumulation; padded keys get -inf
bias.  Used by the UNet self-attention for both decode (forward) and
training (forward+backward) on TPU.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, l_ref,
                m_scr, l_scr, acc_scr, *, scale: float):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    key_mask = mask_ref[0, 0]
    s = s + (1.0 - key_mask.astype(jnp.float32))[None, :] * _NEG_INF

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
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
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        # row logsumexp for the backward pass
        l_ref[0, 0] = m_scr[:] + jnp.log(denom)


def _pad_inputs(q, k, v, key_mask, block_q, block_k):
    b, h, tq, d = q.shape
    tk = k.shape[2]
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
    return q, k, v, key_mask


def _flash_forward(q, k, v, key_mask, scale, block_q, block_k, interpret):
    b, h, tq, d = q.shape
    block_q = min(block_q, tq)
    block_k = min(block_k, k.shape[2])
    q_p, k_p, v_p, mask_p = _pad_inputs(q, k, v, key_mask, block_q, block_k)
    tq_p, tk_p = q_p.shape[2], k_p.shape[2]
    nq, nk = tq_p // block_q, tk_p // block_k

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h, nq, nk),
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
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tq_p, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(mask_p[:, None, :], q_p, k_p, v_p)
    return out[:, :, :tq, :], lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                   dq_ref, dq_scr, *, scale: float):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]
    dsum = dsum_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    key_mask = mask_ref[0, 0]
    s = s + (1.0 - key_mask.astype(jnp.float32))[None, :] * _NEG_INF
    p = jnp.exp(s - lse)  # (bq, bk)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dsum) * scale
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float):
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]
    dsum = dsum_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    key_mask = mask_ref[0, 0]
    s = s + (1.0 - key_mask.astype(jnp.float32))[None, :] * _NEG_INF
    p = jnp.exp(s - lse)  # (bq, bk)

    # dV += P^T dO
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dsum) * scale  # (bq, bk)
    # dK += dS^T Q
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, key_mask, out, lse, g, scale, block_q, block_k,
                    interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = min(block_q, tq)
    block_k = min(block_k, tk)
    q_p, k_p, v_p, mask_p = _pad_inputs(q, k, v, key_mask, block_q, block_k)
    tq_p, tk_p = q_p.shape[2], k_p.shape[2]
    pad_q = tq_p - tq
    g_p = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0))) if pad_q else g
    out_p = (jnp.pad(out, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
             if pad_q else out)
    lse_p = lse  # already padded length from forward

    # D = rowsum(dO * O): cheap elementwise reduce in XLA
    dsum = jnp.sum(g_p.astype(jnp.float32) * out_p.astype(jnp.float32),
                   axis=-1, keepdims=True)
    dsum = jnp.broadcast_to(dsum, (b, h, tq_p, 128))

    nq, nk = tq_p // block_q, tk_p // block_k
    mask3 = mask_p[:, None, :]

    q_spec = pl.BlockSpec((1, 1, block_q, d),
                          lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, block_k, d),
                          lambda b_, h_, qi, ki: (b_, h_, ki, 0),
                          memory_space=pltpu.VMEM)
    l_spec = pl.BlockSpec((1, 1, block_q, 128),
                          lambda b_, h_, qi, ki: (b_, h_, qi, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, block_k),
                          lambda b_, h_, qi, ki: (b_, 0, ki),
                          memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(b, h, nq, nk),
        in_specs=[m_spec, q_spec, k_spec, k_spec, q_spec, l_spec, l_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(mask3, q_p, k_p, v_p, g_p, lse_p, dsum)

    # k-outer grid: swap the roles of the last two grid axes
    q_spec_k = pl.BlockSpec((1, 1, block_q, d),
                            lambda b_, h_, ki, qi: (b_, h_, qi, 0),
                            memory_space=pltpu.VMEM)
    k_spec_k = pl.BlockSpec((1, 1, block_k, d),
                            lambda b_, h_, ki, qi: (b_, h_, ki, 0),
                            memory_space=pltpu.VMEM)
    l_spec_k = pl.BlockSpec((1, 1, block_q, 128),
                            lambda b_, h_, ki, qi: (b_, h_, qi, 0),
                            memory_space=pltpu.VMEM)
    m_spec_k = pl.BlockSpec((1, 1, block_k),
                            lambda b_, h_, ki, qi: (b_, 0, ki),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(b, h, nk, nq),
        in_specs=[m_spec_k, q_spec_k, k_spec_k, k_spec_k, q_spec_k,
                  l_spec_k, l_spec_k],
        out_specs=(k_spec_k, k_spec_k),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, tk_p, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(mask3, q_p, k_p, v_p, g_p, lse_p, dsum)

    return dq[:, :, :tq, :], dk[:, :, :tk, :], dv[:, :, :tk, :]


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention_pallas(q, k, v, key_mask, scale: float,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool = False):
    """Flash attention. q,k,v: (B,H,T,D); key_mask: (B,Tk) 1=valid or None."""
    out, _ = _flash_forward(q, k, v, key_mask, scale, block_q, block_k,
                            interpret)
    return out


def _xla_reference(q, k, v, key_mask, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = s + (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _fwd(q, k, v, key_mask, scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, key_mask, scale, block_q, block_k,
                              interpret)
    return out, (q, k, v, key_mask, out, lse)


def _bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v, key_mask, out, lse = residuals
    dq, dk, dv = _flash_backward(q, k, v, key_mask, out, lse, g, scale,
                                 block_q, block_k, interpret)
    return dq, dk, dv, None


flash_attention_pallas.defvjp(_fwd, _bwd)
