"""Checkpoint surgery: partial parameter transfer and freezing.

Pytree counterparts of the reference's state-dict helpers
(utils/model_io.py:12,42,59,95 — filter_modules / get_partial_state_dict /
transfer_verification / freeze_modules).  Parameters are addressed by
"/"-joined pytree paths (e.g. ``encoder/conv_in/v``); module prefixes select
subtrees just like the reference's dotted-name prefixes.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _flatten(params) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = leaf
    return flat


def filter_modules(params, modules: Sequence[str]) -> List[str]:
    """Validate that every prefix in ``modules`` matches at least one
    parameter path; returns the matching prefixes (reference
    model_io.py:12-39 semantics, raising instead of sys.exit)."""
    flat = _flatten(params)
    ok = []
    missing = []
    for prefix in modules:
        if any(k.startswith(prefix) for k in flat):
            ok.append(prefix)
        else:
            missing.append(prefix)
    if missing:
        raise KeyError(
            f"module prefixes {missing} matched nothing; available roots: "
            f"{sorted({k.split('/')[0] for k in flat})}"
        )
    return ok


def transfer_params(dst_params, src_params, modules: Sequence[str]):
    """Copy leaves under the given prefixes from src into dst with shape
    verification (reference get_partial_state_dict + transfer_verification,
    model_io.py:42-92). Returns the updated dst pytree."""
    src_flat = _flatten(src_params)
    modules = filter_modules(src_params, modules)

    def maybe_replace(path, dst_leaf):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if not any(key.startswith(m) for m in modules):
            return dst_leaf
        if key not in src_flat:
            logger.warning("transfer: %s missing in source, keeping init", key)
            return dst_leaf
        src_leaf = src_flat[key]
        if tuple(np.shape(src_leaf)) != tuple(np.shape(dst_leaf)):
            raise ValueError(
                f"transfer shape mismatch at {key}: "
                f"src {np.shape(src_leaf)} vs dst {np.shape(dst_leaf)}"
            )
        return src_leaf

    return jax.tree_util.tree_map_with_path(maybe_replace, dst_params)


def freeze_mask(params, freeze_prefixes: Sequence[str]):
    """Boolean pytree: True = trainable, False = frozen.  Feed to
    ``optax.multi_transform`` (reference freeze_modules sets
    requires_grad=False, model_io.py:95-116)."""

    def trainable(path, _leaf):
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        return not any(key.startswith(m) for m in freeze_prefixes)

    return jax.tree_util.tree_map_with_path(trainable, params)
