"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over a
'pipe' mesh axis must be numerically invisible — forward AND backward —
vs running the stage stack sequentially on one device, stage weights must
really live one-stage-per-device, and it must compose with data parallel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from serenade_tpu.parallel.pipeline import (
    gpipe,
    microbatch,
    pipeline_mesh,
    place_pipeline_params,
    stack_stage_params,
)

S, D = 4, 32  # stages, feature dim


def _toy_stages(key):
    ks = jax.random.split(key, S)
    return [
        {"w": jax.random.normal(k, (D, D)) * (0.5 / np.sqrt(D)),
         "b": jax.random.normal(jax.random.fold_in(k, 1), (D,)) * 0.1}
        for k in ks
    ]


def _toy_stage_fn(p, a):
    return jnp.tanh(a @ p["w"] + p["b"])


def _sequential(stages, x_flat):
    for p in stages:
        x_flat = _toy_stage_fn(p, x_flat)
    return x_flat


def test_gpipe_forward_matches_sequential():
    stages = _toy_stages(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 6, D))  # batch 8

    want = _sequential(stages, x)

    mesh = pipeline_mesh(pipe=S)
    stacked = place_pipeline_params(stack_stage_params(stages), mesh)
    # the memory point: each device holds exactly one stage's weights
    w = stacked["w"]
    assert w.sharding.spec == P("pipe")
    assert w.addressable_shards[0].data.shape[0] == 1

    xm = microbatch(x, 4)  # M=4 microbatches of 2
    got = gpipe(_toy_stage_fn, stacked, xm, mesh)
    np.testing.assert_allclose(
        np.asarray(got).reshape(x.shape), np.asarray(want), atol=1e-6)


def test_gpipe_grad_matches_sequential():
    """jax.grad through the shard_map pipeline (scan + ppermute + psum all
    have transposes) equals the sequential backward."""
    stages = _toy_stages(jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (8, 4, D))
    tgt = jax.random.normal(jax.random.key(4), (8, 4, D))

    mesh = pipeline_mesh(pipe=S)
    stacked = stack_stage_params(stages)

    def loss_pipe(stacked, x):
        y = gpipe(_toy_stage_fn, stacked, microbatch(x, 4), mesh)
        return jnp.mean((y.reshape(x.shape) - tgt) ** 2)

    def loss_seq(stacked, x):
        y = _sequential([jax.tree_util.tree_map(lambda l: l[i], stacked)
                         for i in range(S)], x)
        return jnp.mean((y - tgt) ** 2)

    lp, gp = jax.value_and_grad(loss_pipe, argnums=(0, 1))(stacked, x)
    ls, gs = jax.value_and_grad(loss_seq, argnums=(0, 1))(stacked, x)

    assert float(lp) == pytest.approx(float(ls), rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        gp, gs,
    )


def test_gpipe_composes_with_data_parallel():
    """dp×pp: microbatch rows shard over 'data' while stages shard over
    'pipe'; result matches the sequential stack."""
    stages = _toy_stages(jax.random.key(5))
    x = jax.random.normal(jax.random.key(6), (8, 4, D))

    mesh = pipeline_mesh(pipe=S, data=2)
    stacked = place_pipeline_params(stack_stage_params(stages), mesh)
    got = gpipe(_toy_stage_fn, stacked, microbatch(x, 4), mesh,
                data_axis="data")
    np.testing.assert_allclose(
        np.asarray(got).reshape(x.shape),
        np.asarray(_sequential(stages, x)), atol=1e-6)


def test_gpipe_transformer_stack():
    """The flagship's BasicTransformerBlock stack (the UNet mid-block
    geometry, models/unet.py) runs as pipeline stages unchanged."""
    from serenade_tpu.models.transformer import BasicTransformerBlock

    dim, t = 16, 12
    block = BasicTransformerBlock(
        dim=dim, num_attention_heads=2, attention_head_dim=8,
        activation_fn="gelu")
    x = jax.random.normal(jax.random.key(7), (4, t, dim)) * 0.3
    params = [block.init(jax.random.key(10 + i), x[:1]) for i in range(S)]

    def stage_fn(p, a):
        return block.apply(p, a, deterministic=True)

    want = x
    for p in params:
        want = stage_fn(p, want)

    mesh = pipeline_mesh(pipe=S)
    stacked = place_pipeline_params(stack_stage_params(params), mesh)
    got = gpipe(stage_fn, stacked, microbatch(x, 4), mesh)
    np.testing.assert_allclose(
        np.asarray(got).reshape(x.shape), np.asarray(want),
        atol=2e-5, rtol=1e-5)


def test_gpipe_stage_count_mismatch_is_loud():
    """8 stacked stages on a 4-way pipe axis must raise, not silently run
    every 2nd stage (each device would apply only its shard's row 0)."""
    stages = _toy_stages(jax.random.key(8)) + _toy_stages(jax.random.key(9))
    mesh = pipeline_mesh(pipe=S)
    stacked = stack_stage_params(stages)
    with pytest.raises(ValueError, match="stage axis 8"):
        gpipe(_toy_stage_fn, stacked, microbatch(
            jax.random.normal(jax.random.key(10), (4, 2, D)), 2), mesh)


def test_gpipe_fewer_microbatches_than_stages():
    """M < S (the bubble-heavy regime): injection clamping and collection
    bookkeeping still produce exact results."""
    stages = _toy_stages(jax.random.key(11))
    x = jax.random.normal(jax.random.key(12), (2, 3, D))  # M=2 < S=4
    mesh = pipeline_mesh(pipe=S)
    stacked = place_pipeline_params(stack_stage_params(stages), mesh)
    got = gpipe(_toy_stage_fn, stacked, x, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_sequential(stages, x)), atol=1e-6)


def test_gpipe_grad_finite_with_sqrt_stage():
    """Warmup lanes run on REAL data, not zeros: a stage op with an
    unbounded derivative at 0 (here sqrt) would otherwise NaN-poison the
    parameter gradients through the discarded warmup outputs' zero
    cotangent (0 * inf = NaN), even though the forward output is exact."""
    stages = _toy_stages(jax.random.key(20))

    def sqrt_stage(p, a):
        # zero in -> zero out with an unbounded derivative at 0: zeros
        # warmup feeds a zero into the NEXT stage at tick 1, whose inf
        # local derivative meets the discarded lane's zero cotangent
        # (verified to NaN the param grads pre-fix)
        return jnp.sqrt(jnp.abs(a @ p["w"]))

    x = jnp.abs(jax.random.normal(jax.random.key(21), (8, 6, D))) + 0.5
    mesh = pipeline_mesh(pipe=S)
    stacked = place_pipeline_params(stack_stage_params(stages), mesh)
    xm = microbatch(x, 4)

    def loss(sp):
        return jnp.sum(gpipe(sqrt_stage, sp, xm, mesh) ** 2)

    grads = jax.grad(loss)(stacked)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k

    # and the forward still matches the sequential oracle
    def seq(x_flat):
        for p in stages:
            x_flat = sqrt_stage(p, x_flat)
        return x_flat

    np.testing.assert_allclose(
        np.asarray(gpipe(sqrt_stage, stacked, xm, mesh)).reshape(x.shape),
        np.asarray(seq(x)), atol=1e-6)
