"""Pallas TPU fused Block1D: conv(k3) + masked GroupNorm + Mish, fwd+bwd.

The UNet's resnet paths (reference matcha_components/decoder.py:66-77
``Block1D``) dominate the train step (ROADMAP: UNet fwd+bwd = 73% of the
step at ~55% internal MXU efficiency).  Lowered separately, each Block1D
costs XLA a conv-output round trip to HBM, a GroupNorm reduction pair, and
a transcendental Mish pass between matmuls.

This kernel runs the whole block per batch row in one VMEM residency,
engineered to keep VPU copy traffic minimal (the first tap-concat version
of this kernel measured 3.4x SLOWER than XLA because the rolled-tap
materializations and f32 window copies dominated):

* the k=3 conv taps are STATIC ROW SLICES of the masked window feeding
  three MXU matmuls accumulated in f32 — no rolls, no (T, 3C) concat,
  window kept in the compute dtype;
* masked GroupNorm statistics in a single pass (sum + sum-of-squares via
  selector-matrix matmuls — no 3-D reshapes in-kernel), matching
  models/layers.py MaskedGroupNorm;
* Mish through ONE exponential: with u = 1+e^z, tanh(softplus(z)) =
  (u^2-1)/(u^2+1) and sigmoid(z) = (u-1)/u, so forward and backward share
  a single transcendental per element.

Backward is two more Pallas kernels under ``jax.custom_vjp``:

* data-grad: recomputes y/stats (3 cheap MXU matmuls instead of a 16 MB
  activation save), forms dz via Mish'(z), the GroupNorm backward
  ``dy = rstd*(dyhat - mean_g(dyhat) - yhat*mean_g(dyhat*yhat))``, the
  transposed-tap conv for dx, and accumulates dgamma/dbeta/dbias across
  the batch grid;
* weight-grad: ``dW[j] = tap_j^T @ dy`` — three matmuls per batch row
  accumulated in a VMEM-resident f32 block.

CALLER CONTRACT: masks must be contiguous prefixes (the kernel derives
``lengths = sum(mask)`` and masks positions [0, n) — an interior-zero
mask would silently compute different activations AND gradients than
the unfused path; it cannot be detected here because the mask is a
traced array).  Every Block1D mask in this model is built from lengths
via iota (utils/masking.py), which satisfies the contract; any new
caller with non-prefix masks must use the unfused path in
models/layers.py.  Shapes are gated by a VMEM-fit check
(:func:`block1d_supported`); callers fall back when it returns False.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # sublane-aligned window margin (conv k=3 only needs 1)


def _mish_parts(z):
    """(mish(z), tanh(softplus(z)), sigmoid(z)) from one exponential."""
    u = 1.0 + jnp.exp(jnp.minimum(z, 20.0))
    u2 = u * u
    t_sp = (u2 - 1.0) / (u2 + 1.0)
    sig = (u - 1.0) / u
    return z * t_sp, t_sp, sig


def _dot(a, b, dims, compute_dtype):
    """dot_general with f32-true precision when computing in f32 (the
    parity/debug mode); bf16 production uses the default MXU path."""
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else None)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _masked_window(x_ref, n, compute_dtype):
    """Window rows with positions outside [0, n) zeroed (conv input
    masking + zero 'same' padding in one predicate), in compute dtype."""
    w = x_ref.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0) - HALO
    inside = (pos >= 0) & (pos < n)
    return jnp.where(inside, x_ref[0], 0).astype(compute_dtype)


def _conv3(xm, w_ref, t: int, compute_dtype):
    """y[t] = sum_j xm[t-1+j] @ W[j]: three static-slice MXU matmuls
    accumulated in f32 (slices are views of the VMEM window — no tap
    materialization)."""
    acc = None
    for j in range(3):
        o = HALO - 1 + j
        yj = _dot(xm[o:o + t], w_ref[j].astype(compute_dtype),
                  ((1,), (0,)), compute_dtype)
        acc = yj if acc is None else acc + yj
    return acc


def _group_broadcast(colsums, sel, denom):
    """(1, Cout) per-channel column sums -> per-group means broadcast back
    to channels, via the (Cout, G) 0/1 selector matrix (layouts stay 2-D).
    """
    gsum = jax.lax.dot_general(colsums, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jax.lax.dot_general(gsum / denom, sel, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _recompute_forward(x_ref, n_ref, w_ref, b_ref, sel_ref,
                       t: int, cg: int, eps: float, compute_dtype):
    """Shared fwd math: returns (y, mu_c, rstd_c, validT, n, sel, denom).

    Single-pass masked GroupNorm statistics: var = E[y^2] - mu^2 (f32
    accumulation; y is a fresh conv output with O(1) scale, so the
    cancellation is benign — parity-tested in f32).
    """
    n = n_ref[pl.program_id(0), 0]
    xm = _masked_window(x_ref, n, compute_dtype)
    y = _conv3(xm, w_ref, t, compute_dtype) + b_ref[:].astype(jnp.float32)
    validT = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) < n
    ym = jnp.where(validT, y, 0.0)
    sel = sel_ref[:].astype(jnp.float32)  # (Cout, G)
    denom = jnp.maximum(n.astype(jnp.float32) * cg, 1.0)
    mu_c = _group_broadcast(jnp.sum(ym, axis=0, keepdims=True), sel, denom)
    e2_c = _group_broadcast(jnp.sum(ym * ym, axis=0, keepdims=True), sel,
                            denom)
    var_c = jnp.maximum(e2_c - mu_c * mu_c, 0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    return y, mu_c, rstd_c, validT, n, sel, denom


def _fwd_kernel(n_ref, x_ref, w_ref, b_ref, gamma_ref, beta_ref, sel_ref,
                out_ref, *, t: int, cg: int, eps: float, compute_dtype):
    y, mu_c, rstd_c, validT, _, _, _ = _recompute_forward(
        x_ref, n_ref, w_ref, b_ref, sel_ref, t, cg, eps, compute_dtype)
    z = (y - mu_c) * rstd_c * gamma_ref[:].astype(jnp.float32) \
        + beta_ref[:].astype(jnp.float32)
    mish_z, _, _ = _mish_parts(z)
    out_ref[0] = jnp.where(validT, mish_z, 0.0).astype(out_ref.dtype)


def _bwd_data_kernel(n_ref, x_ref, g_ref, w_ref, b_ref, gamma_ref,
                     beta_ref, wt_ref, sel_ref,
                     dx_ref, dy_ref, dgamma_ref, dbeta_ref, dbias_ref,
                     *, t: int, cg: int, eps: float, compute_dtype):
    bi = pl.program_id(0)
    y, mu_c, rstd_c, validT, n, sel, denom = _recompute_forward(
        x_ref, n_ref, w_ref, b_ref, sel_ref, t, cg, eps, compute_dtype)
    gamma = gamma_ref[:].astype(jnp.float32)
    yhat = (y - mu_c) * rstd_c
    z = yhat * gamma + beta_ref[:].astype(jnp.float32)

    g = jnp.where(validT, g_ref[0].astype(jnp.float32), 0.0)
    _, t_sp, sig = _mish_parts(z)
    dz = g * (t_sp + z * (1.0 - t_sp * t_sp) * sig)

    @pl.when(bi == 0)
    def _init():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dgamma_ref[:] += jnp.sum(dz * yhat, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dz, axis=0, keepdims=True)

    dyhat = dz * gamma
    a1 = _group_broadcast(jnp.sum(dyhat, axis=0, keepdims=True), sel, denom)
    a2 = _group_broadcast(jnp.sum(dyhat * yhat, axis=0, keepdims=True), sel,
                          denom)
    dy = jnp.where(validT, rstd_c * (dyhat - a1 - yhat * a2), 0.0)

    dbias_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dy_ref[0] = dy.astype(dy_ref.dtype)

    # transposed conv dx[s] = sum_j dy[s+1-j] @ W[j]^T: zero-pad dy by one
    # row each side, then tap j is the static slice dyp[2-j : 2-j+t]
    dyp = jnp.pad(dy.astype(compute_dtype), ((1, 1), (0, 0)))
    acc = None
    for j in range(3):
        o = 2 - j
        dxj = _dot(dyp[o:o + t], wt_ref[j].astype(compute_dtype),
                   ((1,), (0,)), compute_dtype)
        acc = dxj if acc is None else acc + dxj
    dx_ref[0] = jnp.where(validT, acc, 0.0).astype(dx_ref.dtype)


def _bwd_w_kernel(n_ref, x_ref, dy_ref, dw_ref, *, t: int,
                  compute_dtype):
    bi = pl.program_id(0)
    n = n_ref[bi, 0]
    xm = _masked_window(x_ref, n, compute_dtype)
    dy = dy_ref[0].astype(compute_dtype)

    @pl.when(bi == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    for j in range(3):
        o = HALO - 1 + j
        dw_ref[j] += _dot(xm[o:o + t], dy, ((0,), (0,)), compute_dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _compute_dtype(x_dtype):
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def _selector(cout: int, groups: int) -> np.ndarray:
    sel = np.zeros((cout, groups), np.float32)
    cg = cout // groups
    sel[np.arange(cout), np.arange(cout) // cg] = 1.0
    return sel


def _pad_x(x):
    return jnp.pad(x, ((0, 0), (HALO, HALO), (0, 0)))


def _smem_spec(b: int):
    # whole (B, 1) lengths array in SMEM (Mosaic requires sub-array blocks
    # to be tile-aligned; full-array blocks are exempt) — each grid step
    # reads its row by program_id
    return pl.BlockSpec((b, 1), lambda bi: (0, 0),
                        memory_space=pltpu.SMEM)


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM)


def _w_spec(cin, cout):
    return pl.BlockSpec((3, cin, cout), lambda bi: (0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_block1d(groups, eps, interpret, x, lengths, kernel, bias,
                   gamma, beta):
    out, _ = _fused_block1d_fwd(groups, eps, interpret, x, lengths,
                                kernel, bias, gamma, beta)
    return out


def _fused_block1d_fwd(groups, eps, interpret, x, lengths, kernel, bias,
                       gamma, beta):
    b, t, cin = x.shape
    k, _, cout = kernel.shape
    cg = cout // groups
    cdt = _compute_dtype(x.dtype)
    sel = jnp.asarray(_selector(cout, groups))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t=t, cg=cg, eps=eps,
                          compute_dtype=cdt),
        grid=(b,),
        in_specs=[
            _smem_spec(b),
            pl.BlockSpec((1, t + 2 * HALO, cin), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec(cin, cout),
            _vec_spec(cout), _vec_spec(cout), _vec_spec(cout),
            pl.BlockSpec((cout, groups), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, cout), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * 3 * cin * cout,
            bytes_accessed=b * t * (cin + cout) * 4 + 3 * cin * cout * 4,
            transcendentals=b * t * cout,
        ),
        interpret=interpret,
    )(lengths, _pad_x(x), kernel.astype(cdt),
      bias.reshape(1, cout).astype(cdt),
      # GroupNorm affine stays f32 like the unfused path (params are
      # applied to the f32 normalized tensor, never cast to bf16)
      gamma.reshape(1, cout).astype(jnp.float32),
      beta.reshape(1, cout).astype(jnp.float32), sel)
    return out, (x, lengths, kernel, bias, gamma, beta)


def _fused_block1d_bwd(groups, eps, interpret, residuals, g):
    x, lengths, kernel, bias, gamma, beta = residuals
    b, t, cin = x.shape
    k, _, cout = kernel.shape
    cg = cout // groups
    cdt = _compute_dtype(x.dtype)
    # dx[s] = sum_j dy[s+1-j] @ W[j]^T: per-tap transposed weights
    wt = kernel.transpose(0, 2, 1).astype(cdt)  # (3, cout, cin)
    sel = jnp.asarray(_selector(cout, groups))

    dx, dy, dgamma, dbeta, dbias = pl.pallas_call(
        functools.partial(_bwd_data_kernel, t=t, cg=cg, eps=eps,
                          compute_dtype=cdt),
        grid=(b,),
        in_specs=[
            _smem_spec(b),
            pl.BlockSpec((1, t + 2 * HALO, cin), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cout), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            _w_spec(cin, cout),
            _vec_spec(cout), _vec_spec(cout), _vec_spec(cout),
            _w_spec(cout, cin),
            pl.BlockSpec((cout, groups), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, cin), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cout), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, cin), x.dtype),
            jax.ShapeDtypeStruct((b, t, cout), x.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * 3 * (cin * cout + cout * cin),
            bytes_accessed=b * t * (2 * cin + 2 * cout) * 4
            + 6 * cin * cout * 4,
            transcendentals=b * t * cout,
        ),
        interpret=interpret,
    )(lengths, _pad_x(x), g, kernel.astype(cdt),
      bias.reshape(1, cout).astype(cdt),
      gamma.reshape(1, cout).astype(jnp.float32),
      beta.reshape(1, cout).astype(jnp.float32), wt, sel)

    dw = pl.pallas_call(
        functools.partial(_bwd_w_kernel, t=t, compute_dtype=cdt),
        grid=(b,),
        in_specs=[
            _smem_spec(b),
            pl.BlockSpec((1, t + 2 * HALO, cin), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cout), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, cin, cout), lambda bi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, cin, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * 3 * cin * cout,
            bytes_accessed=b * t * (cin + cout) * 4 + 3 * cin * cout * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lengths, _pad_x(x), dy)

    dkernel = dw.astype(kernel.dtype)
    return (dx, None, dkernel,
            dbias[0].astype(bias.dtype), dgamma[0].astype(gamma.dtype),
            dbeta[0].astype(beta.dtype))


_fused_block1d.defvjp(_fused_block1d_fwd, _fused_block1d_bwd)


def block1d_supported(b: int, t: int, cin: int, cout: int, groups: int,
                      dtype, budget_bytes: int = 13_000_000) -> bool:
    """VMEM-fit + shape gate for the fused path.

    Alignment: t multiple of 8, channels multiples of 128 (lane tiles),
    cout divisible by groups.  The estimates track each kernel's live
    set; Mosaic's stack allocator reuses dead temporaries.
    """
    if t % 8 or cin % 128 or cout % 128 or cout % groups:
        return False
    esz = 2 if dtype == jnp.bfloat16 else 4
    w = t + 2 * HALO
    win = w * cin * esz
    wbytes = 3 * cin * cout * esz
    fwd = win + wbytes + 2 * t * cout * 4
    bwd_data = win + 2 * t * cout * esz + 2 * wbytes \
        + 4 * t * cout * 4 + t * cin * 4
    bwd_w = win + t * cout * esz + 3 * cin * cout * 4
    return max(fwd, bwd_data, bwd_w) <= budget_bytes


def fused_block1d(x, mask, kernel, bias, gamma, beta, *, groups: int = 8,
                  eps: float = 1e-5, interpret: bool = False):
    """Fused ``mish(masked_group_norm(conv_k3(x * mask))) * mask``.

    Args:
        x: (B, T, Cin) activations (f32 or bf16).
        mask: (B, T, 1) contiguous-prefix validity mask.
        kernel: (3, Cin, Cout); bias: (Cout,) — conv parameters.
        gamma, beta: (Cout,) GroupNorm affine parameters.

    Numerics match models/layers.py Block1D's unfused path (conv1d 'mm'
    backend + MaskedGroupNorm + mish) to float rounding; gate with
    :func:`block1d_supported` and fall back otherwise.  Differentiable via
    the custom VJP kernels above.
    """
    lengths = jnp.sum(mask[:, :, 0].astype(jnp.int32), axis=1,
                      keepdims=True)
    return _fused_block1d(groups, eps, interpret, x, lengths, kernel,
                          bias, gamma, beta)
