"""Checkpoint save/restore (Orbax, ocdbt layout).

Counterpart of reference trainers/base.py:91-130 pickle checkpoints
(`{model, optimizer, scheduler, steps, epochs}` → here
`{params, opt_state, step, epochs}` in an Orbax StandardCheckpointer
layout).  Same step-named directory convention
(``checkpoint-<steps>steps``), mtime-free latest-checkpoint discovery by
step number, and the reference's two load modes: full resume vs
params-only init (`load_only_params`, ssc_train.py:387-395).

Multi-chip/multi-host semantics the reference has no analogue of: live
sharded ``jax.Array`` trees are saved AS-IS (each host writes only its
addressable shards into the ocdbt store — on a multi-host mesh EVERY
process must call :func:`save_checkpoint`, unlike the reference's
rank-0-only ``torch.save``), and :func:`abstract_like` builds restore
templates that place every leaf directly onto its target sharding —
including a *different* mesh topology than the one that saved it
(orbax reshards on read).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"checkpoint-{step}steps")


def _ckpt_state(step: int, params, opt_state, epochs: int) -> dict:
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    state["meta"] = {
        "step": np.asarray(step), "epochs": np.asarray(epochs)
    }
    return state


def save_checkpoint(root: str, step: int, params, opt_state=None,
                    epochs: int = 0) -> str:
    path = _ckpt_dir(root, step)
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, _ckpt_state(step, params, opt_state, epochs),
                   force=True)
    return path


class AsyncSaver:
    """Non-blocking checkpoint saves: device arrays are snapshotted
    synchronously (so training may mutate state immediately) and the
    serialization/commit runs on background threads — the step loop no
    longer stalls for the full write every ``save_interval_steps``
    (the reference's torch.save, trainers/base.py:98-111, and round-2's
    synchronous orbax save both block).

    Orbax guarantees ordering: a save issued while the previous one is
    still committing first waits for it, so checkpoints never interleave.
    Call :meth:`wait` before reading a just-written checkpoint and
    :meth:`close` at shutdown (both idempotent).
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, root: str, step: int, params, opt_state=None,
             epochs: int = 0) -> str:
        path = _ckpt_dir(root, step)
        self._ckptr.save(path, args=ocp.args.StandardSave(
            _ckpt_state(step, params, opt_state, epochs)), force=True)
        return path

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self._ckptr.close()


def find_latest_checkpoint(root: str) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    best, best_step = None, -1
    for name in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)steps", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(root, name)
    return best


def restore_checkpoint(path: str, template: Optional[dict] = None) -> dict:
    """Restore a checkpoint dict; ``template`` (matching pytree of arrays)
    enables sharded/typed restoration."""
    with ocp.StandardCheckpointer() as restorer:
        if template is not None:
            return restorer.restore(os.path.abspath(path), template)
        return restorer.restore(os.path.abspath(path))


def restore_params_only(path: str, template=None):
    """The ``params`` subtree of a checkpoint.

    With ``template`` (an abstract pytree of the params, e.g. from
    ``abstract_like``) only that subtree is READ from the store — an
    AdamW checkpoint is ~3x params-sized (mu/nu moments), so a full
    restore per snapshot triples the I/O of e.g. checkpoint averaging."""
    if template is not None:
        with ocp.PyTreeCheckpointer() as restorer:
            return restorer.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(item={"params": template},
                                            partial_restore=True),
            )["params"]
    return restore_checkpoint(path)["params"]


def restore_generator_params(path: str):
    """Generator params from a serenade-vocoder-train checkpoint (layout
    contract: ``{"generator", "discriminator"}`` under ``params``) — the
    one place the convention is encoded for the Vocoder / stage-9 loaders."""
    return restore_checkpoint(path)["params"]["generator"]


def find_last_checkpoints(root: str, n: int,
                          max_step: Optional[int] = None) -> list:
    """The ``n`` highest-step checkpoint dirs under ``root`` (ascending).

    With ``max_step``, only checkpoints at or below that step count — the
    averaging window ends at the anchor checkpoint instead of silently
    sliding to the newest snapshots."""
    if not os.path.isdir(root):
        return []
    found = []
    for name in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)steps", name)
        if m and (max_step is None or int(m.group(1)) <= max_step):
            found.append((int(m.group(1)), os.path.join(root, name)))
    return [p for _, p in sorted(found)[-n:]]


def checkpoint_step(path: str) -> Optional[int]:
    """Step count encoded in a ``checkpoint-<N>steps`` path, else None."""
    m = re.fullmatch(r"checkpoint-(\d+)steps",
                     os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else None


def average_checkpoints(paths):
    """Uniform parameter average over checkpoints (the standard
    speech-toolkit eval trick: averaging the last N snapshots smooths the
    optimization endpoint).  Float leaves are averaged in float32;
    non-float leaves are taken from the last checkpoint.

    The reference has no equivalent (its decode loads one .pkl,
    ssc_decode.py:337-341); this is a beyond-parity utility surfaced as
    ``serenade-decode --average-n``.
    """
    import jax
    import numpy as np

    if not paths:
        raise ValueError("no checkpoints to average")
    acc = restore_params_only(paths[0])
    # later snapshots read ONLY the params subtree (skipping the ~2x
    # params-sized optimizer moments), templated on the first restore
    template = abstract_like(acc)
    acc = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, acc)
    for p in paths[1:]:
        nxt = restore_params_only(p, template=template)
        acc = jax.tree_util.tree_map(
            lambda a, b: a + np.asarray(b, np.float32)
            if np.issubdtype(np.asarray(b).dtype, np.floating) else b,
            acc, nxt)
    k = float(len(paths))
    return jax.tree_util.tree_map(
        lambda a: (a / k).astype(np.float32)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, acc)


def abstract_like(tree, mesh=None):
    """Template for sharded restoration: every ``jax.Array`` leaf becomes a
    ``ShapeDtypeStruct`` carrying the leaf's sharding, so orbax places the
    restored shards straight onto the devices (no host round-trip, and on
    multi-host each process reads only its addressable shards).  Non-array
    leaves (host numpy, scalars) pass through as concrete values.

    With ``mesh``, leaves whose live sharding is not a ``NamedSharding``
    (e.g. optimizer step counters created eagerly on the default device)
    are restored fully replicated over the mesh instead — restoring them
    committed to one device would make the train step reject the state
    (mixed device sets)."""
    from jax.sharding import NamedSharding, PartitionSpec

    def leaf(x):
        if isinstance(x, jax.Array):
            sharding = x.sharding
            if mesh is not None and not isinstance(sharding, NamedSharding):
                sharding = NamedSharding(mesh, PartitionSpec())
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    return jax.tree_util.tree_map(leaf, tree)
