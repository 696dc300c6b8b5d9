"""SerenadeNew: Serenade + F0-fluctuation conditioning.

Counterpart of reference serenade/models/serenade_new.py:35-240.  Adds two
conditioning channels holding independently time-rolled copies of the
frame-level F0-fluctuation feature (train: rolls of the source fluc; decode:
rolls of the reference fluc tiled to source length).

Deliberate deviations from the reference (SURVEY §7.4 "quirks not to
replicate"): `torch.roll` with no dim flattens (B, T, 1) before rolling —
we roll the time axis, which is the evident intent; the `np.resize`-on-
tensor and the stray `a.txt` debug write are dropped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from serenade_tpu.config import register
from serenade_tpu.models.serenade import Serenade


def _roll_time(x, shift):
    """Roll (B, T, C) along time by a traced scalar ``shift``."""
    return jnp.roll(x, shift, axis=1)


def tile_to_length(x, out_len: int):
    """np.resize semantics along time: tile then truncate to ``out_len``."""
    t = x.shape[1]
    reps = -(-out_len // t)  # ceil
    tiled = jnp.tile(x, (1, reps, 1))
    return tiled[:, :out_len, :]


@register("model")
class SerenadeNew(Serenade):
    # declared capability consumed by api.Converter: this variant threads
    # the f0-fluctuation feature through training and inference
    uses_f0_fluc = True
    fluc_channels: int = 2

    def __call__(self, x, lengths, logmel, midi, loud, f0_fluc=None, *, rng,
                 deterministic: bool = False, extras: Dict[str, Any] | None = None):
        assert f0_fluc is not None, "SerenadeNew requires f0_fluc"
        k_r1, k_r2, k_rest = jax.random.split(rng, 3)
        T = f0_fluc.shape[1]
        s1 = jax.random.randint(k_r1, (), 0, jnp.maximum(T - 2, 1))
        s2 = jax.random.randint(k_r2, (), 0, jnp.maximum(T - 2, 1))
        fluc = jnp.concatenate(
            [_roll_time(f0_fluc, s1), _roll_time(f0_fluc, s2)], axis=-1
        )
        return super().__call__(
            x, lengths, logmel, midi, loud, rng=k_rest,
            deterministic=deterministic, extras={"fluc": fluc},
        )

    def inference(self, x, lengths, midi, loud, f0_fluc,
                  ref_x, ref_lengths, ref_logmel, ref_midi, ref_loud,
                  ref_f0_fluc, *, rng, n_timesteps: int = 10,
                  temperature: float = 0.667, solver: str = "euler",
                  extras=None):
        k_r1, k_r2, k_rest = jax.random.split(rng, 3)
        src_fluc = tile_to_length(ref_f0_fluc, f0_fluc.shape[1])
        T = src_fluc.shape[1]
        s1 = jax.random.randint(k_r1, (), 0, jnp.maximum(T, 1))
        s2 = jax.random.randint(k_r2, (), 0, jnp.maximum(T, 1))
        fluc = jnp.concatenate(
            [_roll_time(src_fluc, s1), _roll_time(src_fluc, s2)], axis=-1
        )
        ref_fluc = jnp.concatenate(
            [_roll_time(ref_f0_fluc, s1), _roll_time(ref_f0_fluc, s2)], axis=-1
        )
        return super().inference(
            x, lengths, midi, loud, ref_x, ref_lengths, ref_logmel,
            ref_midi, ref_loud, rng=k_rest, n_timesteps=n_timesteps,
            temperature=temperature, solver=solver,
            extras={"fluc": fluc, "ref_fluc": ref_fluc},
        )
