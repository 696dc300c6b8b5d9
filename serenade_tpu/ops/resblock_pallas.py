"""Pallas TPU fused HiFiGAN residual-block branch.

A HiFiGAN resblock branch is a chain over dilations ``d_i``:

    h = x
    for d in dilations:
        a = lrelu(h); a = conv_k(a, dil=d)          # conv1
        [a = lrelu(a); a = conv_k(a, dil=1)]        # conv2 (optional)
        h = h + a

Lowered naively (or as tap-sum matmuls), every conv re-reads its input from
HBM — ``len(dilations) * 2 * k`` passes over a tensor that is ~16 MB at the
vocoder's upper levels.  This kernel streams x through VMEM **once per
branch**: each grid step DMAs one (block_t + 2·halo, C) window, runs the
whole chain in VMEM/registers (taps = ``pltpu.roll`` + MXU matmuls with f32
accumulation), and writes the center block_t rows.

'same'-padding semantics come for free: x is zero-padded by ``halo`` (the
chain's total receptive margin) outside the kernel, and roll wrap-around
garbage stays inside the margins that each stage invalidates anyway.

Status: an opt-in lever, NOT yet wired into vocoder/layers
(HiFiGANResidualBlock lowers through the tap-sum matmul conv backend,
whose measured advantage over this kernel is within tunnel measurement
noise).  Wiring it in needs per-level VMEM budgeting — the stacked branch
weights at C=512 exceed the 16 MB VMEM budget, so the top level must
split by dilation group.  Reference architecture:
serenade/vocoder/models/hifigan.py residual blocks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def _branch_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                   x_scr, sem, *, k: int, dilations: Tuple[int, ...],
                   use_additional_convs: bool, halo: int, block_t: int,
                   t_total: int):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    w = block_t + 2 * halo

    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(qi * block_t, w), :], x_scr, sem)
    dma.start()
    dma.wait()

    # every conv must read ZEROS outside the sequence (torch 'same'
    # padding semantics); the halo of edge tiles would otherwise carry the
    # evolving residual (incl. biases) past the ends
    pos = (qi * block_t - halo
           + jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0))
    inside = (pos >= 0) & (pos < t_total)

    h = x_scr[:].astype(jnp.float32)

    def pd_conv(a_f32, w_ref, b_ref, i, step):
        # taps as circular shifts; Mosaic rotates 32-bit data only, so roll
        # in f32 and cast to the matmul dtype per tap
        p = (k - 1) // 2 * step
        o = None
        for j in range(k):
            sh = (p - j * step) % w
            tap = pltpu.roll(a_f32, sh, 0) if sh else a_f32
            oj = jax.lax.dot_general(
                tap.astype(x_scr.dtype), w_ref[i, j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = oj if o is None else o + oj
        return o + b_ref[i].astype(jnp.float32)

    for i, d in enumerate(dilations):
        a = jnp.where(inside, _lrelu(h), 0.0)
        o = pd_conv(a, w1_ref, b1_ref, i, d)
        if use_additional_convs:
            a2 = jnp.where(inside, _lrelu(o), 0.0)
            o = pd_conv(a2, w2_ref, b2_ref, i, 1)
        h = h + o

    out_ref[0] = h[halo:halo + block_t].astype(out_ref.dtype)


def resblock_branch_pallas(x, w1, b1, w2, b2, *, kernel_size: int,
                           dilations: Tuple[int, ...],
                           use_additional_convs: bool = True,
                           block_t: int = 2048,
                           interpret: bool = False):
    """Fused residual-block branch.

    Args:
        x: (B, T, C).
        w1: (n_dil, K, C, C) dilated-conv kernels (tap-major, channels-last).
        b1: (n_dil, C).
        w2, b2: same shapes for the dilation-1 convs (pass zeros-shaped
            arrays when ``use_additional_convs`` is False; unused).
        kernel_size: K (odd).
        dilations: per-stage dilation factors.
        block_t: time-tile size (rows per grid step).

    Returns:
        (B, T, C) — same as chaining lrelu→conv→[lrelu→conv]→+residual.
    """
    b, t, c = x.shape
    k = kernel_size
    assert k % 2 == 1
    margin = sum((k - 1) // 2 * d for d in dilations)
    if use_additional_convs:
        margin += len(dilations) * ((k - 1) // 2)
    halo = -(-margin // 16) * 16  # sublane-aligned

    block_t = min(block_t, -(-t // 16) * 16)
    t_pad = -(-t // block_t) * block_t
    n_tiles = t_pad // block_t

    x_p = jnp.pad(x, ((0, 0), (halo, halo + (t_pad - t)), (0, 0)))

    grid = (b, n_tiles)
    out = pl.pallas_call(
        functools.partial(
            _branch_kernel, k=k, dilations=tuple(dilations),
            use_additional_convs=use_additional_convs, halo=halo,
            block_t=block_t, t_total=t,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 whole
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, c),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_t + 2 * halo, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x_p, w1, b1, w2, b2)
    return out[:, :t, :]


def fused_block_t(n_dil: int, k: int, c: int, budget_bytes: int = 10_000_000,
                  max_block_t: int = 4096) -> int:
    """Largest sublane-aligned tile that keeps the kernel's VMEM footprint
    under budget (v5e VMEM is 16 MB/core; Mosaic's stack allocator keeps
    roughly the k rolled taps plus a handful of f32 intermediates live).

    Returns 0 when the branch cannot run usefully (callers fall back to
    the conv lowering): C < 128 (Mosaic rejects lane-dim slices below one
    128-lane tile in the HBM DMA) or VMEM-infeasible weight stacks
    (e.g. C=256 with k=11 is 8.6 MB of weights alone).
    """
    if c < 128:
        return 0
    weights = 2 * n_dil * k * c * c * 2     # w1+w2, bf16
    per_row = (k + 6) * c * 4               # live f32 (row, c) arrays
    rows = (budget_bytes - weights) // per_row
    block_t = int(min(max_block_t, (rows // 16) * 16))
    return block_t if block_t >= 512 else 0
