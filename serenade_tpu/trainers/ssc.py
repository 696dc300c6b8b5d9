"""Step-driven SSC trainer.

Counterpart of reference trainers/base.py:18-233 + trainers/ssc.py:24-454:
a step-counted loop with log/eval/save intervals, tensorboard metrics,
resumable Orbax checkpoints, intermediate-sample generation on the first
dev batch, and partial-transfer/freeze support.

TPU shape: the hot loop is `host batch → device_put(sharded) → jitted
step`; everything else (logging, checkpointing, eval wav/png dumps) happens
on host at interval boundaries only.  "Rank 0" gating maps to
``jax.process_index() == 0``.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from typing import Any, Callable, Dict, Iterable, Optional

import jax

from serenade_tpu.checkpoint import (
    AsyncSaver,
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from serenade_tpu.config import register
from serenade_tpu.parallel.mesh import shard_batch

logger = logging.getLogger(__name__)


def _is_main_process() -> bool:
    return jax.process_index() == 0


@register("trainer")
class SSCTrainer:
    """Drives a jitted train step to ``train_max_steps``."""

    BATCH_RENAME = {"xs": "x", "ys": "logmel", "scores": "midi",
                    "louds": "loud", "lens": "lengths"}

    def __init__(
        self,
        config: Dict[str, Any],
        train_step: Callable,
        state,
        train_iter: Iterable,
        dev_iter: Optional[Iterable] = None,
        mesh=None,
        writer=None,
        outdir: str = "exp",
        eval_fn: Optional[Callable] = None,
        rng=None,
    ):
        self.config = config
        self.train_step = train_step
        self.state = state
        self.train_iter = train_iter
        self.dev_iter = dev_iter
        self.mesh = mesh
        self.outdir = outdir
        self.eval_fn = eval_fn
        self.rng = rng if rng is not None else jax.random.key(0)
        self.steps = int(jax.device_get(state.step))
        self.epochs = 0
        self.finish_train = False
        self.total_train_loss = defaultdict(float)
        self._pending = []
        self._n_acc = 0  # metrics accumulated since the last log boundary
        # backpressure depth: how many steps the host may run ahead of
        # the device before fetching the OLDEST pending metrics.  Without
        # a bound the step loop free-runs to the log interval, queueing
        # every dispatched batch in host RAM — on the tunneled backend
        # (async dispatch, ~70 MB/batch at b=16 real lengths) that grew
        # tens of GB before the first log line and OOM'd long runs.
        # 32 keeps the device pipeline deep while bounding host memory.
        self._dispatch_window = int(config.get("dispatch_window", 32))
        self._writer = writer
        self._last_log_time = time.time()
        # jax.profiler trace capture (SURVEY §5.1: strict superset of the
        # reference's ad-hoc RTF/peak-memory logging)
        self.profile_dir = config.get("profile_dir")
        self.profile_steps = tuple(config.get("profile_steps", (10, 15)))
        self._profiling = False
        # interval saves commit on background threads by default so the
        # step loop never stalls for the write (`async_checkpointing:
        # false` restores fully synchronous saves)
        self._async_save = bool(config.get("async_checkpointing", True))
        self._saver = AsyncSaver() if self._async_save else None
        self._last_saved_step = -1

        if writer is None and _is_main_process():
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(outdir)
            except Exception:  # pragma: no cover
                self._writer = None

    # ------------------------------------------------------------------

    def run(self):
        max_steps = int(self.config.get("train_max_steps", 40000))
        logger.info("training from step %d to %d", self.steps, max_steps)
        try:
            while not self.finish_train:
                self._train_epoch(max_steps)
                self.epochs += 1
        finally:
            if self._profiling:  # trace started but the stop step never
                # came (early finish/crash): write it out instead of
                # losing the capture
                jax.profiler.stop_trace()
                self._profiling = False
                logger.info("profiler trace written to %s",
                            self.profile_dir)
            if self._last_saved_step != self.steps:
                # skip when the interval save already committed this
                # step: a force re-save deletes the only copy first —
                # a crash mid-rewrite would destroy the final checkpoint
                self.save(self.steps)
            self.wait_for_saves()
        logger.info("finished training at step %d", self.steps)

    def _prep_batch(self, batch):
        model_batch = {
            self.BATCH_RENAME.get(k, k): v for k, v in batch.items()
        }
        if self.mesh is not None:
            model_batch = shard_batch(model_batch, self.mesh)
        return model_batch

    def _maybe_profile(self):
        if not self.profile_dir:
            return
        start, stop = self.profile_steps
        if self.steps == start and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
            logger.info("profiler trace started (steps %d-%d)", start, stop)
        elif self.steps >= stop and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("profiler trace written to %s", self.profile_dir)

    def _train_epoch(self, max_steps: int):
        for batch in self.train_iter:
            self._maybe_profile()
            self.rng, step_key = jax.random.split(self.rng)
            self.state, metrics = self.train_step(
                self.state, self._prep_batch(batch), step_key
            )
            self.steps += 1
            if self.steps == 1:
                # hard liveness marker: the fetch is the only real
                # barrier on tunneled links — separates "compiling" from
                # "executing" when diagnosing a silent first interval
                loss0 = float(jax.device_get(metrics["train/loss"]))
                logger.info("first step executed: train/loss = %.4f",
                            loss0)
            self._accumulate(metrics)
            self._check_log_interval()
            self._check_eval_interval()
            self._check_save_interval()
            if self.steps >= max_steps:
                self.finish_train = True
                return

    def _accumulate(self, metrics):
        # hold unfetched device scalars so no step blocks on its own
        # metrics, but fetch the OLDEST once the window fills: the fetch
        # is the only real barrier on tunneled links (block_until_ready
        # can return early there), and it bounds how far the host runs
        # ahead of the device (see _dispatch_window above)
        self._pending.append(metrics)
        self._n_acc += 1
        while len(self._pending) >= self._dispatch_window:
            for k, v in jax.device_get(self._pending.pop(0)).items():
                self.total_train_loss[k] += float(v)

    # ------------------------------------------------------------------
    # intervals
    # ------------------------------------------------------------------

    def _check_log_interval(self):
        interval = int(self.config.get("log_interval_steps", 500))
        if self.steps % interval:
            return
        # divide by the count actually accumulated: after resuming from a
        # mid-interval checkpoint the first window is shorter than
        # `interval`, and total/interval would under-report every loss
        n_acc = self._n_acc
        for m in jax.device_get(self._pending):
            for k, v in m.items():
                self.total_train_loss[k] += float(v)
        self._pending = []
        self._n_acc = 0
        elapsed = time.time() - self._last_log_time
        self._last_log_time = time.time()
        if not _is_main_process():
            self.total_train_loss = defaultdict(float)
            return
        for key, total in self.total_train_loss.items():
            avg = total / max(n_acc, 1)
            logger.info("(steps: %d) %s = %.4f", self.steps, key, avg)
            if self._writer is not None:
                self._writer.add_scalar(key, avg, self.steps)
        if self._writer is not None:
            self._writer.add_scalar(
                "train/steps_per_sec", interval / max(elapsed, 1e-9), self.steps
            )
        self.total_train_loss = defaultdict(float)

    def _check_eval_interval(self):
        interval = int(self.config.get("eval_interval_steps", 2500))
        if self.steps % interval or self.eval_fn is None:
            return
        # NO rank gate here: the eval computation is a collective program
        # over (possibly) globally-sharded params — every process must
        # enter it or process 0 deadlocks at the first cross-host
        # collective.  eval_fn gates its host IO internally.
        try:
            self.eval_fn(self.state, self.steps)
        except Exception:  # eval must never kill training
            logger.exception("intermediate eval failed at step %d", self.steps)

    def _check_save_interval(self):
        interval = int(self.config.get("save_interval_steps", 2500))
        if self.steps % interval:
            return
        self.save(self.steps)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def save(self, step: int):
        # live (possibly sharded) arrays go straight to orbax: every host
        # writes only its addressable shards into the ocdbt store, so on a
        # multi-host mesh ALL processes reach this call (no rank-0 gate —
        # unlike the reference's torch.save, trainers/base.py:98-111)
        t0 = time.time()
        if self._saver is not None:
            path = self._saver.save(
                self.outdir, step, self.state.params,
                self.state.opt_state, epochs=self.epochs,
            )
        else:
            path = save_checkpoint(
                self.outdir, step, self.state.params,
                self.state.opt_state, epochs=self.epochs,
            )
        self._last_saved_step = step
        if _is_main_process():
            logger.info(
                "saved checkpoint: %s (%s, step blocked %.3fs)", path,
                "async commit" if self._saver is not None else "sync",
                time.time() - t0)

    def wait_for_saves(self):
        """Block until every async checkpoint commit has finished (no-op
        for synchronous saves)."""
        if self._saver is not None:
            self._saver.wait()

    def resume(self, path: Optional[str] = None, load_only_params: bool = False):
        path = path or find_latest_checkpoint(self.outdir)
        if path is None:
            logger.info("no checkpoint found; starting fresh")
            return
        import numpy as np

        import jax.numpy as jnp

        from serenade_tpu.checkpoint import abstract_like

        # restore against the LIVE state's structure: a raw restore
        # returns plain dicts, silently destroying the optax NamedTuple
        # opt_state (the optimizer then crashes on the next step).
        # abstract_like keeps each leaf's sharding so restoration places
        # shards directly on the mesh (resharding if the checkpoint was
        # written under a different topology) — the params-only branch
        # needs this placement just as much as the full resume.
        template = {
            "params": abstract_like(self.state.params, self.mesh),
            "meta": {"step": np.asarray(0), "epochs": np.asarray(0)},
        }
        if self.state.opt_state is not None:
            template["opt_state"] = abstract_like(
                self.state.opt_state, self.mesh)
        try:
            restored = restore_checkpoint(path, template)
        except Exception:
            if not load_only_params:
                raise
            # fine-tune init from a checkpoint whose optimizer state has a
            # different structure (different optimizer/accum config):
            # params are all we need — raw restore, host-resident
            logger.warning("template restore failed; raw params-only "
                           "restore", exc_info=True)
            restored = restore_checkpoint(path)
        if load_only_params:
            self.state = self.state.__class__(
                params=restored["params"], opt_state=self.state.opt_state,
                step=self.state.step,
            )
        else:
            self.state = self.state.__class__(
                params=restored["params"],
                opt_state=restored.get("opt_state", self.state.opt_state),
                step=jnp.asarray(int(restored["meta"]["step"]), jnp.int32),
            )
            self.steps = int(restored["meta"]["step"])
            self.epochs = int(restored["meta"].get("epochs", 0))
        logger.info("restored checkpoint %s (steps=%d)", path, self.steps)


@register("trainer")
class SSCTrainerNew(SSCTrainer):
    """Adds the f0_fluc stream to the batch mapping (reference
    trainers/ssc.py:238-454)."""

    BATCH_RENAME = dict(SSCTrainer.BATCH_RENAME, f0_flucs="f0_fluc")
