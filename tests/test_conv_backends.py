"""conv1d / conv_transpose1d: the 'mm' (tap-sum matmul, TPU fast path) and
'lax' (XLA conv op) lowerings must agree exactly in geometry and to f32
accumulation noise in values, across the kernel/stride/dilation/padding
space the models use."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from serenade_tpu.models.layers import conv1d, conv_transpose1d


@pytest.mark.parametrize("k,stride,dilation,pad", [
    (1, 1, 1, 0),
    (3, 1, 1, 1),
    (3, 1, 3, 3),
    (5, 1, 2, 4),
    (7, 1, 1, 3),
    (11, 1, 5, 25),
    (3, 2, 1, 1),      # strided (sifigan downsamples)
    (10, 5, 1, 5),     # sine-embedding style: k=2s
    (4, 2, 1, 1),
])
def test_conv1d_mm_matches_lax(k, stride, dilation, pad):
    rng = np.random.default_rng(k * 100 + stride * 10 + dilation)
    x = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, 16, 24)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(24,)), jnp.float32)
    y_lax = conv1d(x, w, b, stride=stride, dilation=dilation,
                   padding=(pad, pad), backend="lax")
    y_mm = conv1d(x, w, b, stride=stride, dilation=dilation,
                  padding=(pad, pad), backend="mm")
    assert y_mm.shape == y_lax.shape
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_lax),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("k,stride,pad,outpad", [
    (16, 8, 4, 0),     # hifigan upsample 8
    (4, 2, 1, 0),      # hifigan upsample 2
    (10, 5, 3, 1),     # sifigan upsample 5 (odd: output_padding 1)
    (6, 3, 2, 1),      # sifigan upsample 3
    (8, 4, 2, 0),
    (3, 2, 1, 0),      # k < 2s edge
    (5, 1, 2, 0),      # stride 1 degenerate
    (4, 2, 0, 1),      # output_padding overhangs the deconv support
    (6, 3, 0, 2),      # same, stride 3
])
def test_conv_transpose1d_mm_matches_lax(k, stride, pad, outpad):
    rng = np.random.default_rng(k * 100 + stride)
    x = jnp.asarray(rng.normal(size=(2, 40, 12)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, 12, 20)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(20,)), jnp.float32)
    y_lax = conv_transpose1d(x, w, b, stride=stride, padding=pad,
                             output_padding=outpad, backend="lax")
    y_mm = conv_transpose1d(x, w, b, stride=stride, padding=pad,
                            output_padding=outpad, backend="mm")
    assert y_mm.shape == y_lax.shape
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_lax),
                               atol=2e-5, rtol=1e-5)


def test_mm_backend_grads_match():
    """Backward pass through the mm lowering matches lax (training uses
    these convs in the UNet/encoder)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 32, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 8, 8)) * 0.3, jnp.float32)

    def loss(w, backend):
        y = conv1d(x, w, None, stride=1, dilation=2, padding=(2, 2),
                   backend=backend)
        return jnp.sum(jnp.square(y))

    g_lax = jax.grad(lambda w: loss(w, "lax"))(w)
    g_mm = jax.grad(lambda w: loss(w, "mm"))(w)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_lax),
                               atol=1e-4, rtol=1e-5)


def test_vocoder_output_invariant_to_backend():
    """Whole HiFiGAN generator produces the same waveform on both
    lowerings (checkpoint-compat guarantee)."""
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

    model = HiFiGANGenerator(channels=32, upsample_scales=(8, 2),
                             upsample_kernel_sizes=(16, 4),
                             resblock_kernel_sizes=(3, 7),
                             resblock_dilations=((1, 3), (1, 3)))
    mel = jnp.asarray(np.random.default_rng(1).normal(size=(1, 32, 80)),
                      jnp.float32)
    params = model.init(jax.random.key(0), mel)

    import os
    old = os.environ.get("SERENADE_CONV_BACKEND")
    try:
        os.environ["SERENADE_CONV_BACKEND"] = "lax"
        y_lax = model.apply(params, mel)
        os.environ["SERENADE_CONV_BACKEND"] = "mm"
        y_mm = model.apply(params, mel)
    finally:
        if old is None:
            os.environ.pop("SERENADE_CONV_BACKEND", None)
        else:
            os.environ["SERENADE_CONV_BACKEND"] = old
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_lax),
                               atol=5e-5, rtol=1e-5)
