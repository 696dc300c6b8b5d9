"""Functional training step: loss → grad → clip → optim, one jitted program.

TPU-native counterpart of reference trainers/ssc.py:57-101 (`_train_step`).
Differences by design:

* The whole step (forward, backward, clipping, optimizer, schedule) is one
  XLA program with donated state — no per-step host round trips except the
  scalar metrics fetch.
* Gradient accumulation is a `lax.scan` over a micro-batch axis inside the
  same program (reference gates backward on a Python counter,
  trainers/base.py:141-142).
* Data parallelism comes from the batch's 'data'-axis sharding; XLA inserts
  the gradient all-reduce (no DDP object).  Tensor parallelism comes from
  the params' 'model'-axis sharding (parallel/sharding.py).
* The prior loss is gated by ``prior_loss_start_steps`` like the reference
  (trainers/ssc.py:76-84) via `jnp.where` on the step counter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from serenade_tpu.config import register, resolve
import serenade_tpu.schedulers  # noqa: F401  (register schedulers)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def _moment_dtype(mu_dtype):
    """'bfloat16'/'float32' (config strings) -> dtype; None passes through.

    bf16 first moments halve the mu read+write traffic of the HBM-bound
    optimizer tail (docs/PROFILING.md: 3.2 ms of the 30.7 ms step) at the
    cost of ~3 decimal digits on a quantity that only steers update
    direction; optax stochastic-rounding-free cast is adequate for mu (nu
    stays f32 — it sits under a sqrt and spans a huge dynamic range).
    """
    return None if mu_dtype is None else jnp.dtype(mu_dtype)


@register("optimizer", "AdamW")
def _adamw(learning_rate, weight_decay: float = 0.01, b1: float = 0.9,
           b2: float = 0.999, eps: float = 1e-8, mu_dtype=None, **_unused):
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay,
                       mu_dtype=_moment_dtype(mu_dtype))


@register("optimizer", "Adam")
def _adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, mu_dtype=None, **_unused):
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps,
                      mu_dtype=_moment_dtype(mu_dtype))


@register("optimizer", "SGD")
def _sgd(learning_rate, momentum: float = 0.0, **_unused):
    return optax.sgd(learning_rate, momentum=momentum or None)


def build_optimizer(config: Dict[str, Any], trainable_mask=None):
    """Compose schedule + optimizer + grad clip from a reference-style config
    (optimizer_type/optimizer_params/scheduler_type/scheduler_params/
    grad_norm keys, conf/serenade.yaml:62-72)."""
    opt_params = dict(config.get("optimizer_params", {}))
    lr = opt_params.pop("lr", 1e-3)
    sched_factory = resolve("scheduler", config.get("scheduler_type", "ConstantLR"))
    schedule = sched_factory(lr, **config.get("scheduler_params", {}))
    opt_factory = resolve("optimizer", config.get("optimizer_type", "AdamW"))
    tx = opt_factory(schedule, **opt_params)

    chain = []
    grad_norm = config.get("grad_norm")
    if grad_norm:
        chain.append(optax.clip_by_global_norm(float(grad_norm)))
    chain.append(tx)
    tx = optax.chain(*chain)

    if trainable_mask is not None:
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()}, trainable_mask
        )
    return tx, schedule


def create_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def build_train_step(
    model,
    tx,
    *,
    prior_loss_start_steps: int = 0,
    grad_accum: int = 1,
    batch_to_model_args: Optional[Callable] = None,
    donate: bool = True,
    opt_state_shardings=None,
):
    """Return a jitted ``(state, batch, rng) -> (state, metrics)``.

    ``batch`` is a dict of arrays with leading batch axis (sharded on
    'data' by the caller).  With ``grad_accum > 1`` every array must have a
    leading ``(grad_accum, micro_batch, ...)`` layout.

    ``opt_state_shardings`` (a NamedSharding pytree matching
    ``state.opt_state``, from ``parallel.infer_opt_state_shardings``)
    enables ZeRO-1: the new optimizer state is sharding-constrained so the
    moment update stays partitioned over the data axis across steps
    (reference replicates moments per DDP rank, trainers/base.py:136-148).
    Pass the SAME shardings used to place the initial state.
    """
    if batch_to_model_args is None:
        def batch_to_model_args(batch):
            return (batch["x"], batch["lengths"], batch["logmel"],
                    batch["midi"], batch["loud"]), {}

    def loss_fn(params, batch, rng, step):
        args, kwargs = batch_to_model_args(batch)
        rngs = {"dropout": jax.random.fold_in(rng, 1)}
        out = model.apply(params, *args, rng=rng, deterministic=False,
                          rngs=rngs, **kwargs)
        # strict >, matching the reference gate (ref trainers/ssc.py:80
        # `self.steps > prior_loss_start_steps`): with the default 0 the
        # very first step trains on cfm_loss alone
        use_prior = (step > prior_loss_start_steps).astype(jnp.float32)
        loss = out["cfm_loss"] + use_prior * out["prior_loss"]
        metrics = {
            "train/vector_loss": out["cfm_loss"],
            "train/prior_loss": out["prior_loss"],
            "train/loss": loss,
        }
        return loss, metrics

    def single_grad(params, batch, rng, step):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, step
        )
        return grads, metrics

    def step_fn(state: TrainState, batch, rng):
        if grad_accum > 1:
            def micro(carry, xs):
                g_acc, m_acc = carry
                micro_batch, key = xs
                g, m = single_grad(state.params, micro_batch, key, state.step)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m)
                return (g_acc, m_acc), ()

            zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zeros_m = {
                "train/vector_loss": 0.0, "train/prior_loss": 0.0,
                "train/loss": 0.0,
            }
            keys = jax.random.split(rng, grad_accum)
            (grads, metrics), _ = jax.lax.scan(
                micro, (zeros_g, zeros_m), (batch, keys)
            )
            scale = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            metrics = jax.tree_util.tree_map(lambda m: m * scale, metrics)
        else:
            grads, metrics = single_grad(state.params, batch, rng, state.step)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        if opt_state_shardings is not None:
            new_opt_state = jax.lax.with_sharding_constraint(
                new_opt_state, opt_state_shardings)
        new_params = optax.apply_updates(state.params, updates)
        metrics["train/grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
