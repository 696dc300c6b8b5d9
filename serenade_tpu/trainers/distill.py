"""Few-step distillation of a trained CFM: 10-step sampler → 1-2 steps.

Beyond the reference, whose only sampler is the fixed 10-step Euler loop
(reference matcha_components/flow_matching.py:40-93).  Two modes, both
generating (x0, teacher-endpoint) pairs with `Serenade.make_reflow_batch`
(frozen teacher integrates its own ODE from a KNOWN temperature-scaled
noise x0, under training-style infilling conditioning with the segment
fraction widened to (lo, 1.0) so the all-zero-conditioning inference
regime is covered):

* ``endpoint`` (default) — progressive-distillation-style direct
  endpoint matching: the student's OWN ``k``-step Euler rollout from x0
  is regressed onto the teacher's endpoint (masked MSE, backprop through
  the k estimator evals).  This optimizes exactly the deployed sampler:
  measured on a trained field, the 2-step student lands within ~0.1 dB
  MCD of the teacher-10's own error to the converged flow, the 1-step
  student within ~0.5 dB (tests/test_distill.py).  The student is
  SPECIALIZED to its k — sampling it at other step counts degrades.
* ``reflow`` (Liu et al., "Flow Straight and Fast", 2022) — the OT-CFM
  objective IS rectified flow, so fine-tuning on the straight paths
  (standard CFM loss with the flow source pinned to x0 and the target
  pinned to x1_hat, `CFM.compute_loss` ``x0=``) straightens the field at
  EVERY step count: ~2.3x lower few-step error than the teacher, but it
  plateaus above ``endpoint``'s quality at any fixed k (measured: 0.96
  vs 0.42 dB at k=2).  Use it when one checkpoint must serve several
  step-count/latency tiers.

In both modes grad → clip → optimizer touches the ``cfm_decoder``
subtree only (encoder/GST are shared with the teacher and stay frozen,
so the distilled checkpoint is a drop-in for decode/serving), and the
whole step is one XLA program with the same contract as
`trainers.train_step.build_train_step`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from serenade_tpu.trainers.train_step import TrainState


def distill_trainable_mask(params):
    """True = trainable (cfm_decoder subtree), False = frozen.

    Encoder and GST feed the teacher conditioning and are untouched by the
    reflow loss; freezing them (rather than relying on their zero grads)
    keeps AdamW weight decay from eroding shared weights.
    """
    from serenade_tpu.utils.model_io import freeze_mask

    return freeze_mask(params, ["params/encoder", "params/gst"])


def build_distill_step(
    model,
    teacher_params,
    tx,
    *,
    mode: str = "endpoint",
    student_steps: int = 2,
    n_teacher_steps: int = 10,
    solver: str = "euler",
    temperature: float = 0.667,
    mask_size=None,
    batch_to_model_args=None,
    donate: bool = True,
):
    """Return a jitted ``(state, batch, rng) -> (state, metrics)``.

    ``teacher_params`` are captured as compile-time constants (they live
    on device once; the program never re-uploads them).  ``state.params``
    is the student, initialized FROM the teacher by the caller.
    ``student_steps`` is the deployed Euler step count (endpoint mode
    backpropagates through exactly that rollout; ignored by reflow).
    """
    if mode not in ("endpoint", "reflow"):
        raise ValueError(f"unknown distillation mode '{mode}'")
    if batch_to_model_args is None:
        def batch_to_model_args(batch):
            return (batch["x"], batch["lengths"], batch["logmel"],
                    batch["midi"], batch["loud"]), {}

    def loss_fn(params, pair, rng):
        if mode == "endpoint":
            out = model.apply(
                params, pair["mu"], pair["mask"], pair["spk"],
                n_timesteps=student_steps, rng=None, solver="euler",
                x0=pair["x0"],
                method=lambda m, *a, **kw: m.cfm_decoder.inference(*a, **kw),
            )
            c = out.shape[-1]
            err = jnp.square((out - pair["x1_hat"]) * pair["mask"])
            loss = jnp.sum(err) / (
                jnp.maximum(jnp.sum(pair["mask"]), 1.0) * c)
        else:
            rngs = {"dropout": jax.random.fold_in(rng, 1)}
            loss, _ = model.apply(
                params, pair["x1_hat"], pair["mask"], pair["mu"],
                pair["spk"], mask_l=pair["mask"], rng=rng,
                deterministic=False, x0=pair["x0"], rngs=rngs,
                method=lambda m, *a, **kw: m.cfm_decoder.compute_loss(
                    *a, **kw),
            )
        return loss, {"train/distill_loss": loss, "train/loss": loss}

    def step_fn(state: TrainState, batch, rng):
        k_pair, k_loss = jax.random.split(rng)
        args, kwargs = batch_to_model_args(batch)
        pair = model.apply(
            teacher_params, *args, rng=k_pair,
            n_timesteps=n_teacher_steps, temperature=temperature,
            solver=solver, mask_size=mask_size,
            method="make_reflow_batch", **kwargs,
        )
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pair, k_loss
        )
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["train/grad_norm"] = optax.global_norm(grads)
        return TrainState(params=new_params, opt_state=new_opt_state,
                          step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def distill_config_overrides(config: Dict[str, Any]) -> Dict[str, Any]:
    """Config keys a distilled checkpoint carries so downstream consumers
    (decode, serving) pick the fast sampler by default."""
    out = dict(config)
    out["distilled"] = True
    out.setdefault("inference_n_timesteps", 2)
    out.setdefault("inference_solver", "euler")
    return out
