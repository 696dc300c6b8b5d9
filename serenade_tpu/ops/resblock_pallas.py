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

Wired into HiFiGAN inference via ``resblock_backend='fused'``
(vocoder/layers.py HiFiGANResidualBlock): ``fused_block_t`` budgets the
time tile per level; C<128 levels are lane-padded to one 128-lane tile;
VMEM-infeasible weight stacks (big C × big k) fall back to the tap-sum
matmul conv lowering.  Reference architecture:
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
        # in f32 and cast to the matmul dtype per tap.  The k taps are
        # CONCATENATED along channels and contracted in ONE matmul: a
        # (w, C)·(C, C) matmul has contraction 128-256, a regime the MXU
        # pipelines poorly (~5-10 TFLOP/s measured); (w, k·C)·(k·C, C)
        # widens the contraction k-fold and amortizes the output pass.
        p = (k - 1) // 2 * step
        taps = []
        for j in range(k):
            sh = (p - j * step) % w
            tap = pltpu.roll(a_f32, sh, 0) if sh else a_f32
            taps.append(tap.astype(x_scr.dtype))
        cat = jnp.concatenate(taps, axis=1)          # (w, k*C)
        wmat = w_ref[i].reshape(-1, w_ref.shape[-1])  # (k*C, C)
        o = jax.lax.dot_general(
            cat, wmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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

    if c < 128:
        # Lane-pad narrow channels to one 128-lane tile: Mosaic rejects HBM
        # DMA slices below a lane tile, and sub-128 matmuls waste the same
        # MXU lanes anyway.  Zero channels stay zero through the whole chain
        # (lrelu(0)=0, zero weight columns, zero bias), so slicing them off
        # at the end is exact.
        pad_c = 128 - c
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_c)))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, pad_c), (0, pad_c)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, pad_c), (0, pad_c)))
        b1 = jnp.pad(b1, ((0, 0), (0, pad_c)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad_c)))
        out = resblock_branch_pallas(
            x, w1, b1, w2, b2, kernel_size=kernel_size, dilations=dilations,
            use_additional_convs=use_additional_convs, block_t=block_t,
            interpret=interpret,
        )
        return out[:, :, :c]

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
    the conv lowering): C < 128 (the kernel lane-pads these to a full
    128-lane tile, which is numerically exact but MEASURED SLOWER than the
    tap-sum conv lowering on chip — 19.5 vs 16.8 ms full-generator at
    T=1024 — because the padded x/out HBM traffic doubles/quadruples at
    exactly the bandwidth-bound levels) or VMEM-infeasible weight stacks
    (e.g. C=256 with k=11 is 8.6 MB of weights alone).
    """
    if c < 128:
        return 0
    weights = 2 * n_dil * k * c * c * 2     # w1+w2, bf16
    per_row = (k + 6) * c * 4               # live f32 (row, c) arrays
    rows = (budget_bytes - weights) // per_row
    block_t = int(min(max_block_t, (rows // 16) * 16))
    return block_t if block_t >= 512 else 0
