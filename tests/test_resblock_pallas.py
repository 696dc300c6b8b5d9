"""Fused Pallas residual-block branch vs the conv1d chain (interpret mode).

The CPU test mesh runs the kernel through the Pallas interpreter; on-chip
equivalence vs the mm lowering was verified separately (bf16 accumulation
noise only).  The baseline chain here runs backend='lax' on CPU, which is
exact f32 — do not run this comparison on TPU, where f32 convs use
bf16-decomposition precision (~1e-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from serenade_tpu.models.layers import conv1d
from serenade_tpu.ops.resblock_pallas import resblock_branch_pallas


def _chain(x, w1, b1, w2, b2, k, dils, add):
    h = x
    for i, d in enumerate(dils):
        a = jnp.where(h >= 0, h, 0.1 * h)
        o = conv1d(a, w1[i], b1[i], dilation=d,
                   padding=((k - 1) // 2 * d,) * 2, backend="lax")
        if add:
            a2 = jnp.where(o >= 0, o, 0.1 * o)
            o = conv1d(a2, w2[i], b2[i], dilation=1,
                       padding=((k - 1) // 2,) * 2, backend="lax")
        h = h + o
    return h


@pytest.mark.parametrize("k,dils,add,B,T,C,bt", [
    (3, (1, 3, 5), True, 1, 300, 32, 128),   # hifigan k=3 branch
    (7, (1, 3), False, 2, 200, 16, 64),      # no additional convs
    (11, (1, 3, 5), True, 1, 500, 64, 256),  # hifigan k=11 branch
    (3, (1, 2), True, 1, 100, 8, 1024),      # single tile (block_t > T)
])
def test_fused_branch_matches_chain(k, dils, add, B, T, C, bt):
    rng = np.random.default_rng(k * 13 + T)
    n = len(dils)
    x = jnp.asarray(rng.normal(size=(B, T, C)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(n, k, C, C)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(n, C)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(n, k, C, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(n, C)) * 0.1, jnp.float32)

    ref = _chain(x, w1, b1, w2, b2, k, dils, add)
    got = resblock_branch_pallas(
        x, w1, b1, w2, b2, kernel_size=k, dilations=dils,
        use_additional_convs=add, block_t=bt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_branch_edge_zeros_semantics():
    """Sequence edges must behave like torch zero padding at every stage,
    not like a halo carrying evolved values past the ends."""
    rng = np.random.default_rng(7)
    k, dils, C, T = 3, (1, 3), 16, 64
    n = len(dils)
    x = jnp.asarray(rng.normal(size=(1, T, C)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(n, k, C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)  # big biases
    w2 = jnp.asarray(rng.normal(size=(n, k, C, C)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)
    ref = _chain(x, w1, b1, w2, b2, k, dils, True)
    got = resblock_branch_pallas(
        x, w1, b1, w2, b2, kernel_size=k, dilations=dils,
        use_additional_convs=True, block_t=32, interpret=True)
    # the first/last rows are exactly where halo leakage would show
    np.testing.assert_allclose(np.asarray(got)[:, :4], np.asarray(ref)[:, :4],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got)[:, -4:], np.asarray(ref)[:, -4:],
                               atol=1e-5)


def test_generator_fused_backend_matches_conv():
    """HiFiGANGenerator output is invariant to resblock backend (identical
    param tree; fused = Pallas interpret on CPU)."""
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

    kwargs = dict(channels=32, upsample_scales=(8, 2),
                  upsample_kernel_sizes=(16, 4),
                  resblock_kernel_sizes=(3, 7),
                  resblock_dilations=((1, 3), (1, 3)))
    mel = jnp.asarray(np.random.default_rng(3).normal(size=(1, 24, 80)),
                      jnp.float32)
    m_conv = HiFiGANGenerator(**kwargs)
    m_fused = HiFiGANGenerator(**kwargs, resblock_backend="fused")
    params = m_conv.init(jax.random.key(0), mel)
    y_conv = m_conv.apply(params, mel)
    y_fused = m_fused.apply(params, mel)   # same tree — no conversion needed
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_conv),
                               atol=5e-5, rtol=1e-5)
