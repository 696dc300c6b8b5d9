"""Pipeline parallelism: GPipe microbatching over a 'pipe' mesh axis.

The reference has no pipeline (or any model) parallelism — its only
strategy is single-node DDP (ref ssc_train.py:179,351-359).  This module
is the beyond-parity scale-out path for models whose layer stack exceeds
one chip's HBM: a uniform stack of S stages is laid out one-stage-per-
device along a ``pipe`` mesh axis, and M microbatches stream through with
`lax.ppermute` shifting activations to the next stage each tick — the
classic TPU pipeline schedule (activations ride ICI, no host involvement,
S + M - 1 ticks total, bubble fraction (S-1)/(S+M-1)).

Everything is expressed with `shard_map` + `lax.scan` + collectives, so
the whole pipeline is ONE XLA program, and — because `ppermute`/`psum`
have transposes — `jax.grad` through it yields the exact 1F1B-equivalent
backward with no extra machinery.  Serenade itself (84 M params) fits on
one chip; this exists for the scale regime the parallel/ layer targets
and composes with the 'data' axis (dp×pp) like any other mesh dimension.

Layout contract:

* ``stacked_params``: a pytree whose leaves carry a leading stage axis of
  size S (``stack_stage_params`` builds it from per-stage pytrees); it is
  sharded ``P('pipe')`` so each device holds exactly its stage's weights.
* ``x``: ``(M, mb, ...)`` microbatched input (``microbatch`` reshapes a
  flat batch); every stage must map an ``(mb, ...)`` activation to the
  same shape (uniform-stack requirement, as in GPipe).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(params_list):
    """Stack S per-stage pytrees into one pytree with a leading stage axis."""
    return jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *params_list)


def microbatch(x, num_microbatches: int):
    """(B, ...) -> (M, B // M, ...) microbatched view."""
    b = x.shape[0]
    if b % num_microbatches:
        raise ValueError(f"batch {b} not divisible by M={num_microbatches}")
    return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])


def gpipe(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str | None = None,
    param_specs=None,
):
    """Run ``stage_fn`` S times (one stage per device on ``axis``) over the
    microbatched input ``x`` of shape (M, mb, ...); returns the same shape.

    ``data_axis`` composes dp×pp: the microbatch dim shards over it (each
    pipeline instance processes its batch slice; stage weights replicate
    across 'data' and shard across 'pipe').

    ``param_specs`` (a PartitionSpec pytree matching ``stacked_params``,
    default ``P(axis)`` everywhere) composes tp×pp: stage weights may
    additionally shard inner dims over a 'model' axis — ``stage_fn`` then
    receives LOCAL tp shards and must close its row-parallel contractions
    with an explicit ``lax.psum`` over that axis (everything inside
    shard_map is manual; see ``parallel/composed.py``).

    Differentiable: take `jax.grad` of a loss on the output with respect
    to ``stacked_params`` and/or ``x`` as usual.
    """
    s = mesh.shape[axis]
    m = x.shape[0]
    ticks = m + s - 1
    # one stage per device, exactly: a larger multiple would silently run
    # only every (S/s)-th stage (each local shard applies its row 0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(stacked_params):
        if leaf.shape[0] != s:
            raise ValueError(
                f"stacked stage axis {leaf.shape[0]} != mesh '{axis}' size "
                f"{s} at {jax.tree_util.keystr(path)}")

    def _local(p_stacked_local, x_all):
        p_local = jax.tree_util.tree_map(lambda l: l[0], p_stacked_local)
        idx = lax.axis_index(axis)
        fwd = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            act, outbuf = carry
            # stage 0 injects microbatch t (clamped; surplus ticks feed a
            # repeated microbatch whose result is never collected)
            mb = x_all[jnp.clip(t, 0, m - 1)]
            a_in = jnp.where(idx == 0, mb, act)
            out = stage_fn(p_local, a_in)
            # the LAST stage's tick-t output is microbatch t-(S-1)
            j = t - (s - 1)
            valid = jnp.logical_and(idx == s - 1,
                                    jnp.logical_and(j >= 0, j < m))
            written = lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.clip(j, 0, m - 1), 0)
            outbuf = jnp.where(valid, written, outbuf)
            act_next = lax.ppermute(out, axis, fwd)
            return (act_next, outbuf), None

        # the carry varies per pipe device from tick 1 on; mark the initial
        # value varying so scan's carry type is stable (shard_map VMA rule).
        # Warmup activations are REAL data (x_all[0]), not zeros: warmup
        # outputs are discarded, but their zero cotangent still transposes
        # through stage_fn, and 0 * inf = NaN — a stage op with an
        # unbounded derivative at 0 (sqrt, x/|x|) would NaN-poison the
        # parameter gradients if warmup ran on zeros.
        carry0 = jax.tree_util.tree_map(
            lambda z: lax.pcast(z, (axis,), to="varying"),
            (x_all[0], jnp.zeros_like(x_all)))
        (_, outbuf), _ = lax.scan(tick, carry0, jnp.arange(ticks))
        # only the last device holds real outputs; psum broadcasts them
        outbuf = jnp.where(idx == s - 1, outbuf, jnp.zeros_like(outbuf))
        return lax.psum(outbuf, axis)

    if param_specs is None:
        p_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    else:
        p_specs = param_specs
    x_spec = P(None, data_axis) if data_axis else P()
    run = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(p_specs, x_spec), out_specs=x_spec,
    )
    return run(stacked_params, x)


def place_pipeline_params(stacked_params, mesh: Mesh, axis: str = "pipe"):
    """Device-put stacked stage params so each device holds ONLY its stage
    (leading stage axis sharded on ``axis``) — the memory point of pp."""
    return jax.tree_util.tree_map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P(axis))),
        stacked_params)


def pipeline_mesh(pipe: int, data: int = 1):
    """A ('data', 'pipe') mesh (make_mesh with a renamed second axis —
    inherits its device-count validation and topology-aware layout)."""
    from serenade_tpu.parallel.mesh import make_mesh

    return make_mesh(data=data, model=pipe, axis_names=("data", "pipe"))
