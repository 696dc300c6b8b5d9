"""Checkpoint save/restore (Orbax).

Counterpart of reference trainers/base.py:91-130 pickle checkpoints
(`{model, optimizer, scheduler, steps, epochs}` → here
`{params, opt_state, step, epochs}` in an Orbax StandardCheckpointer
layout).  Same step-named directory convention
(``checkpoint-<steps>steps``), mtime-free latest-checkpoint discovery by
step number, and the reference's two load modes: full resume vs
params-only init (`load_only_params`, ssc_train.py:387-395).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"checkpoint-{step}steps")


def save_checkpoint(root: str, step: int, params, opt_state=None,
                    epochs: int = 0) -> str:
    path = _ckpt_dir(root, step)
    with ocp.StandardCheckpointer() as saver:
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        state["meta"] = {
            "step": np.asarray(step), "epochs": np.asarray(epochs)
        }
        saver.save(path, state, force=True)
    return path


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


def restore_params_only(path: str):
    return restore_checkpoint(path)["params"]
