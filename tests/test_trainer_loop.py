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
