"""Training-runtime tests: optimizer composition, schedules, gradient
accumulation, freeze masks, partial transfer, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from serenade_tpu.checkpoint import (
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from serenade_tpu.trainers import (
    build_optimizer,
    build_train_step,
    create_train_state,
)
from serenade_tpu.utils.model_io import (
    filter_modules,
    freeze_mask,
    transfer_params,
)

CONFIG = {
    "optimizer_type": "AdamW",
    "optimizer_params": {"lr": 1e-2},
    "scheduler_type": "MultiStepLR",
    "scheduler_params": {"gamma": 0.5, "milestones": [10, 20]},
    "grad_norm": 1.0,
}


def test_multistep_schedule_values():
    _, schedule = build_optimizer(CONFIG)
    assert float(schedule(0)) == pytest.approx(1e-2)
    assert float(schedule(10)) == pytest.approx(5e-3)
    assert float(schedule(25)) == pytest.approx(2.5e-3)


def test_warmup_schedule_shape():
    cfg = dict(CONFIG, scheduler_type="WarmupLR",
               scheduler_params={"warmup_steps": 100})
    _, schedule = build_optimizer(cfg)
    vals = [float(schedule(s)) for s in (0, 50, 99, 1000)]
    assert vals[0] < vals[1] < vals[2]          # rising during warmup
    assert vals[3] < vals[2]                    # decaying after


class _ToyModel:
    """Quadratic toy standing in for the flax model API."""

    def apply(self, params, x, *, rng, deterministic, rngs=None):
        w = params["params"]["w"]
        loss = jnp.sum(jnp.square(x @ w)) / x.shape[0]
        return {"cfm_loss": loss, "prior_loss": 0.1 * jnp.sum(jnp.abs(w)),
                "loss": loss}


def _toy_setup(grad_accum=1):
    model = _ToyModel()
    params = {"params": {"w": jnp.ones((4, 3))}}
    tx, _ = build_optimizer(CONFIG)
    adapter = lambda b: ((b["x"],), {})  # noqa: E731
    step = build_train_step(model, tx, grad_accum=grad_accum,
                            batch_to_model_args=adapter, donate=False)
    state = create_train_state(params, tx)
    return step, state


def test_train_step_reduces_loss():
    step, state = _toy_setup()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                    jnp.float32)
    losses = []
    for i in range(50):
        state, metrics = step(state, {"x": x}, jax.random.key(i))
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0] * 0.8  # grad-clipped descent
    assert int(state.step) == 50


def test_grad_accum_matches_big_batch():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)),
                    jnp.float32)
    step1, state1 = _toy_setup(grad_accum=1)
    state1, m1 = step1(state1, {"x": x}, jax.random.key(0))
    step2, state2 = _toy_setup(grad_accum=2)
    micro = {"x": x.reshape(2, 4, 4)}
    state2, m2 = step2(state2, micro, jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(state1.params["params"]["w"]),
        np.asarray(state2.params["params"]["w"]), atol=1e-6,
    )


def test_freeze_mask_blocks_updates():
    params = {"params": {"enc": {"w": jnp.ones((2, 2))},
                         "dec": {"w": jnp.ones((2, 2))}}}
    mask = freeze_mask(params, ["params/enc"])
    tx, _ = build_optimizer(CONFIG, trainable_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["params"]["enc"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["params"]["dec"]["w"]).sum()) > 0.0


def test_transfer_params_subtree_and_shape_check():
    dst = {"params": {"enc": {"w": jnp.zeros((2, 2))},
                      "dec": {"w": jnp.zeros((3,))}}}
    src = {"params": {"enc": {"w": jnp.ones((2, 2))},
                      "dec": {"w": jnp.ones((3,))}}}
    out = transfer_params(dst, src, ["params/enc"])
    assert float(out["params"]["enc"]["w"].sum()) == 4.0
    assert float(out["params"]["dec"]["w"].sum()) == 0.0
    with pytest.raises(KeyError):
        filter_modules(src, ["params/nonexistent"])
    bad_src = {"params": {"enc": {"w": jnp.ones((5, 5))},
                          "dec": {"w": jnp.ones((3,))}}}
    with pytest.raises(ValueError):
        transfer_params(dst, bad_src, ["params/enc"])


def test_checkpoint_roundtrip(tmp_path):
    params = {"layer": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    opt_state = {"momentum": np.ones(3, np.float32)}
    path = save_checkpoint(str(tmp_path), 1234, params, opt_state, epochs=7)
    assert find_latest_checkpoint(str(tmp_path)) == path
    save_checkpoint(str(tmp_path), 2000, params, opt_state)
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint-2000steps")
    restored = restore_checkpoint(path)
    np.testing.assert_array_equal(restored["params"]["layer"]["w"],
                                  params["layer"]["w"])
    assert int(restored["meta"]["step"]) == 1234
    assert int(restored["meta"]["epochs"]) == 7
