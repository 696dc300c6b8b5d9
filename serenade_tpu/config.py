"""Configuration + component registry.

One coherent system replacing the reference's three mechanisms (SURVEY §5.6):

* YAML + CLI merge with CLI precedence, re-serialized next to checkpoints with
  a version stamp (reference ssc_train.py:223-233).
* A string-keyed registry replacing the ``getattr``-on-package reflection
  factories (``model_type``/``trainer_type``/``collater_type``/
  ``optimizer_type``/``scheduler_type``, ssc_train.py:268-349) — the
  extension mechanism of the whole framework.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Callable, Dict

import yaml

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def register(kind: str, name: str | None = None) -> Callable:
    """Decorator: ``@register("model", "Serenade")``."""

    def wrap(obj):
        key = name or obj.__name__
        _REGISTRIES.setdefault(kind, {})[key] = obj
        return obj

    return wrap


def resolve(kind: str, name: str):
    """Look up a registered component; raise with the known names on miss."""
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        known = sorted(_REGISTRIES.get(kind, {}))
        raise KeyError(f"unknown {kind} {name!r}; registered: {known}") from None


def registered(kind: str) -> Dict[str, Any]:
    return dict(_REGISTRIES.get(kind, {}))


def load_config(path: str, overrides: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Load a YAML config and merge CLI/programmatic overrides (CLI wins)."""
    with open(path) as f:
        config = yaml.safe_load(f)
    if overrides:
        config.update({k: v for k, v in overrides.items() if v is not None})
    return config


def dump_config(config: Dict[str, Any], path: str) -> None:
    """Serialize the effective config (with framework version) for provenance."""
    from serenade_tpu import __version__

    config = copy.deepcopy(config)
    config["version"] = __version__
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
