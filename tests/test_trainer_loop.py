"""SSCTrainer loop mechanics: intervals, checkpoint autosave, profiler hook."""

import glob
import os

import jax
import jax.numpy as jnp

from serenade_tpu.trainers.ssc import SSCTrainer
from serenade_tpu.trainers.train_step import TrainState


def _toy_setup(tmp_path, config_extra=None):
    params = {"w": jnp.zeros((2, 2))}
    state = TrainState(params=params, opt_state=None,
                       step=jnp.zeros((), jnp.int32))

    def step(state, batch, rng):
        new = TrainState(params=state.params, opt_state=None,
                         step=state.step + 1)
        return new, {"train/loss": jnp.float32(1.0) / (state.step + 1)}

    batches = [{"xs": jnp.zeros((2, 4, 3)), "lens": jnp.array([4, 4]),
                "ys": jnp.zeros((2, 4, 2)), "louds": jnp.zeros((2, 4, 1)),
                "scores": jnp.zeros((2, 4, 1))} for _ in range(6)]
    config = {
        "train_max_steps": 12, "log_interval_steps": 4,
        "eval_interval_steps": 1000, "save_interval_steps": 6,
    }
    config.update(config_extra or {})
    trainer = SSCTrainer(
        config=config, train_step=step, state=state, train_iter=batches,
        outdir=str(tmp_path), writer=False or None, rng=jax.random.key(0),
    )
    trainer._writer = None  # no tensorboard in tests
    return trainer


def test_loop_runs_to_max_steps_and_saves(tmp_path):
    trainer = _toy_setup(tmp_path)
    trainer.run()
    assert trainer.steps == 12
    ckpts = glob.glob(os.path.join(str(tmp_path), "checkpoint-*steps"))
    # interval saves at 6 and 12 plus the finally-save (step 12, idempotent)
    steps = sorted(int(os.path.basename(c).split("-")[1].split("steps")[0])
                   for c in ckpts)
    assert steps == [6, 12]


def test_profiler_hook_writes_trace(tmp_path):
    prof_dir = str(tmp_path / "trace")
    trainer = _toy_setup(
        tmp_path,
        {"profile_dir": prof_dir, "profile_steps": (2, 4)},
    )
    trainer.run()
    files = glob.glob(os.path.join(prof_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace files written"


def test_resume_roundtrip(tmp_path):
    trainer = _toy_setup(tmp_path)
    trainer.run()
    trainer2 = _toy_setup(tmp_path)
    trainer2.resume()
    assert trainer2.steps == 12


def test_resume_restores_optimizer_structure_and_trains(tmp_path):
    """Resume must reconstruct the optax NamedTuple opt_state — a raw
    Orbax restore returns plain dicts and the NEXT optimizer step crashes
    with \"'dict' object has no attribute 'mu'\" (caught by the on-chip
    endurance run; the toy tests above use opt_state=None and miss it)."""
    import numpy as np

    from serenade_tpu.trainers import (
        build_optimizer, build_train_step, create_train_state,
    )

    class _Quadratic:
        def apply(self, params, x, *, rng, deterministic, rngs=None):
            w = params["params"]["w"]
            loss = jnp.mean(jnp.square(x @ w))
            return {"cfm_loss": loss, "prior_loss": jnp.float32(0.0),
                    "loss": loss}

    params = {"params": {"w": jnp.ones((3, 3))}}
    tx, _ = build_optimizer({
        "optimizer_type": "AdamW", "optimizer_params": {"lr": 1e-2},
        "scheduler_type": "ConstantLR", "scheduler_params": {},
        "grad_norm": 1.0,
    })
    step = build_train_step(
        _Quadratic(), tx, donate=False,
        batch_to_model_args=lambda b: ((b["x"],), {}),  # trainer renames xs->x
    )
    batches = [{"xs": jnp.ones((2, 3))} for _ in range(8)]
    config = {"train_max_steps": 4, "log_interval_steps": 2,
              "save_interval_steps": 4, "eval_interval_steps": 1000}
    t1 = SSCTrainer(config=config, train_step=step,
                    state=create_train_state(params, tx),
                    train_iter=iter(batches), outdir=str(tmp_path),
                    rng=jax.random.key(0))
    t1._writer = None
    t1.run()

    t2 = SSCTrainer(config=dict(config, train_max_steps=6), train_step=step,
                    state=create_train_state(params, tx),
                    train_iter=iter(batches), outdir=str(tmp_path),
                    rng=jax.random.key(1))
    t2._writer = None
    t2.resume()
    assert t2.steps == 4
    t2.run()  # the crash happened HERE before the fix
    assert t2.steps == 6
    w1 = np.asarray(jax.device_get(t1.state.params["params"]["w"]))
    w2 = np.asarray(jax.device_get(t2.state.params["params"]["w"]))
    assert not np.allclose(w1, w2)  # continued training moved the weights


def test_async_checkpointing_snapshot_semantics(tmp_path):
    """Async (default) interval saves must snapshot the state at the save
    step even though training keeps mutating it while the commit runs in
    the background: the async run's checkpoints restore bit-identically
    to a fully synchronous run's, and no checkpoint is lost or partial."""
    import numpy as np

    from serenade_tpu.checkpoint import restore_checkpoint
    from serenade_tpu.trainers import (
        build_optimizer, build_train_step, create_train_state,
    )

    class _Quadratic:
        def apply(self, params, x, *, rng, deterministic, rngs=None):
            w = params["params"]["w"]
            loss = jnp.mean(jnp.square(x @ w))
            return {"cfm_loss": loss, "prior_loss": jnp.float32(0.0),
                    "loss": loss}

    def run_one(outdir, use_async):
        params = {"params": {"w": jnp.ones((3, 3))}}
        tx, _ = build_optimizer({
            "optimizer_type": "AdamW", "optimizer_params": {"lr": 1e-2},
            "scheduler_type": "ConstantLR", "scheduler_params": {},
            "grad_norm": 1.0,
        })
        step = build_train_step(
            _Quadratic(), tx, donate=False,
            batch_to_model_args=lambda b: ((b["x"],), {}),
        )
        t = SSCTrainer(
            config={"train_max_steps": 8, "log_interval_steps": 4,
                    "save_interval_steps": 4, "eval_interval_steps": 1000,
                    "async_checkpointing": use_async},
            train_step=step, state=create_train_state(params, tx),
            train_iter=iter([{"xs": jnp.ones((2, 3))} for _ in range(8)]),
            outdir=str(outdir), rng=jax.random.key(0))
        t._writer = None
        assert (t._saver is not None) == use_async
        t.run()  # run() waits for pending commits in its finally

    run_one(tmp_path / "async", True)
    run_one(tmp_path / "sync", False)

    for step_n in (4, 8):
        a = restore_checkpoint(
            str(tmp_path / "async" / f"checkpoint-{step_n}steps"))
        s = restore_checkpoint(
            str(tmp_path / "sync" / f"checkpoint-{step_n}steps"))
        assert int(a["meta"]["step"]) == step_n
        np.testing.assert_array_equal(
            np.asarray(a["params"]["params"]["w"]),
            np.asarray(s["params"]["params"]["w"]))
