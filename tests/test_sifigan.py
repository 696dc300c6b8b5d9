"""SiFiGAN generator + feature tests."""

import numpy as np
import jax
import jax.numpy as jnp

from serenade_tpu.sifigan import SiFiGANGenerator, SignalGenerator
from serenade_tpu.sifigan.features import dense_factors_per_level
from serenade_tpu.sifigan.generator import pitch_dependent_conv

SR = 24000


def test_signal_generator_sine():
    gen = SignalGenerator(sample_rate=SR, hop_size=120, noise_amp=0.0)
    f0 = np.concatenate([np.zeros(10), np.full(40, 200.0), np.zeros(10)])
    sig = gen(f0)
    assert sig.shape == (60 * 120, 1)
    # unvoiced region silent, voiced region a 0.1-amp sine
    assert np.abs(sig[:1100]).max() == 0.0
    voiced = sig[1400:4000, 0]
    assert 0.09 < np.abs(voiced).max() <= 0.10001
    # frequency check via zero crossings: 200 Hz -> 400 crossings/sec
    crossings = np.sum(np.diff(np.signbit(voiced)))
    dur = len(voiced) / SR
    assert abs(crossings / dur - 400) < 20


def test_dense_factors_shapes_and_values():
    cf0 = np.full(20, 240.0)
    dfs = dense_factors_per_level(cf0, SR, [0.5, 1, 4, 8], [5, 4, 3, 2])
    cum = [5, 20, 60, 120]
    for d, us in zip(dfs, cum):
        assert d.shape == (20 * us,)
    # level 3: full rate, dense 8 -> dilation = 24000/(240*8) = 12.5
    assert abs(dfs[3][0] - 12.5) < 1e-4
    # level 0: rate 1 kHz, dense 0.5 -> 1000/(240*0.5) = 8.33
    assert abs(dfs[0][0] - 1000.0 / 120.0) < 1e-4


def test_pitch_dependent_conv_identity_center_tap():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 4)),
                    jnp.float32)
    d = jnp.full((1, 32), 3.0)
    k = jnp.zeros((3, 4, 4)).at[1].set(jnp.eye(4))
    y = pitch_dependent_conv(x, d, k, None, dilation=2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_generator_shapes():
    model = SiFiGANGenerator(
        in_channels=7, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4),
        source_resblock_dilations=((1,), (1, 2)),
        filter_resblock_kernel_sizes=(3,),
        filter_resblock_dilations=((1, 3),),
    )
    Tf = 20
    total = 8
    c = jnp.zeros((1, Tf, 7))
    sine = jnp.zeros((1, Tf * total, 1))
    dfs = [jnp.ones((1, Tf * 4)), jnp.ones((1, Tf * 8))]
    params = jax.jit(lambda: model.init(jax.random.key(0), sine, c, dfs))()
    y, excitation = jax.jit(
        lambda p: model.apply(p, sine, c, dfs)
    )(params)
    assert y.shape == (1, Tf * total, 1)
    assert excitation.shape == (1, Tf * total, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)


def test_generator_share_upsamples():
    kwargs = dict(
        in_channels=7, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4),
        source_resblock_dilations=((1,), (1, 2)),
        filter_resblock_kernel_sizes=(3,),
        filter_resblock_dilations=((1, 3),),
    )
    Tf, total = 10, 8
    c = jnp.zeros((1, Tf, 7))
    sine = jnp.zeros((1, Tf * total, 1))
    dfs = [jnp.ones((1, Tf * 4)), jnp.ones((1, Tf * 8))]

    def n_params(share):
        m = SiFiGANGenerator(**kwargs, share_upsamples=share)
        p = jax.jit(lambda: m.init(jax.random.key(0), sine, c, dfs))()
        y, _ = m.apply(p, sine, c, dfs)
        assert y.shape == (1, Tf * total, 1)
        return sum(x.size for x in jax.tree_util.tree_leaves(p))

    assert n_params(True) < n_params(False)  # shared stacks save params
