"""Mesh-parallelism correctness: sharded training must match single-device
numerics, and tensor-parallel sharding must not change results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from serenade_tpu.parallel import (
    infer_param_shardings,
    make_mesh,
    shard_batch,
    shard_params,
)
from serenade_tpu.trainers import (
    build_optimizer,
    build_train_step,
    create_train_state,
)

CONFIG = {
    "optimizer_type": "AdamW",
    "optimizer_params": {"lr": 1e-2},
    "scheduler_type": "ConstantLR",
    "scheduler_params": {},
    "grad_norm": 1.0,
}


class _ToyModel:
    def apply(self, params, x, *, rng, deterministic, rngs=None):
        w1 = params["params"]["w1"]  # (64, 1024)
        w2 = params["params"]["w2"]  # (1024, 64)
        h = jnp.tanh(x @ w1)
        loss = jnp.mean(jnp.square(h @ w2 - x))
        return {"cfm_loss": loss, "prior_loss": jnp.float32(0.0),
                "loss": loss}


def _setup():
    rng = np.random.default_rng(0)
    params = {"params": {
        "w1": jnp.asarray(rng.normal(size=(64, 1024)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(1024, 64)) * 0.1, jnp.float32),
    }}
    x = jnp.asarray(rng.normal(size=(8, 16, 64)), jnp.float32)
    tx, _ = build_optimizer(CONFIG)
    model = _ToyModel()
    adapter = lambda b: ((b["x"],), {})  # noqa: E731
    step = build_train_step(model, tx, batch_to_model_args=adapter,
                            donate=False)
    return model, params, tx, step, x


def _run_steps(step, state, x, n=5):
    for i in range(n):
        state, metrics = step(state, {"x": x}, jax.random.key(i))
    return jax.device_get(state.params), float(metrics["train/loss"])


def test_dp_matches_single_device():
    model, params, tx, step, x = _setup()

    # single device
    state = create_train_state(params, tx)
    p_single, l_single = _run_steps(step, state, x)

    # 4-way data parallel
    mesh = make_mesh(data=4, model=1)
    params_dp = shard_params(params, mesh)
    state = create_train_state(params_dp, tx)
    x_dp = shard_batch({"x": x}, mesh)["x"]
    p_dp, l_dp = _run_steps(step, state, x_dp)

    assert l_dp == pytest.approx(l_single, rel=1e-5)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(p_dp["params"][k]), np.asarray(p_single["params"][k]),
            atol=5e-4,
        )


def test_tp_matches_single_device():
    model, params, tx, step, x = _setup()
    state = create_train_state(params, tx)
    p_single, l_single = _run_steps(step, state, x)

    mesh = make_mesh(data=2, model=2)
    shardings = infer_param_shardings(params, mesh)
    # w1 (64, 1024): 65536 elems, last dim divisible -> sharded on model
    assert shardings["params"]["w1"].spec == P(None, "model")
    params_tp = shard_params(params, mesh)
    state = create_train_state(params_tp, tx)
    x_tp = shard_batch({"x": x}, mesh)["x"]
    p_tp, l_tp = _run_steps(step, state, x_tp)

    assert l_tp == pytest.approx(l_single, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_tp["params"]["w1"]), np.asarray(p_single["params"]["w1"]),
        atol=5e-4,
    )
