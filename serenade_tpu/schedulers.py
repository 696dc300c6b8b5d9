"""Learning-rate schedules (optax), registered by name.

Counterparts of the reference's scheduler registry entries
(ssc_train.py:341-349): torch ``MultiStepLR`` (the shipped configs'
choice, conf/serenade.yaml:66-72), ESPnet ``WarmupLR``
(schedulers/warmup_lr.py:24-62), and the deprecated ``NoamLR``
(schedulers/noam_lr.py:13-66).
"""

from __future__ import annotations

from typing import Sequence

import optax

from serenade_tpu.config import register


@register("scheduler", "MultiStepLR")
def multistep_lr(lr: float, milestones: Sequence[int], gamma: float = 0.5,
                 **_unused):
    """lr * gamma^(number of passed milestones)."""
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


@register("scheduler", "WarmupLR")
def warmup_lr(lr: float, warmup_steps: int = 25000, **_unused):
    """lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.asarray(step, jnp.float32) + 1.0
        return lr * warmup_steps**0.5 * jnp.minimum(
            s**-0.5, s * warmup_steps**-1.5
        )

    return schedule


@register("scheduler", "NoamLR")
def noam_lr(lr: float, model_size: int = 320, warmup_steps: int = 25000,
            **_unused):
    """Noam schedule; equivalent to WarmupLR scaled by model_size^-0.5 with
    its lr folded differently (kept for config parity)."""

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.asarray(step + 1, jnp.float32)
        return (
            lr * model_size**-0.5
            * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)
        )

    return schedule


@register("scheduler", "ConstantLR")
def constant_lr(lr: float, **_unused):
    return optax.constant_schedule(lr)
