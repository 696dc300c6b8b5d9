"""Argparse type coercion helpers (reference utils/types.py role)."""

from __future__ import annotations

import argparse
from typing import Optional


def str2bool(value: str) -> bool:
    if isinstance(value, bool):
        return value
    v = value.lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {value!r}")


def int_or_none(value: str) -> Optional[int]:
    if value.lower() in ("none", "null", ""):
        return None
    return int(value)


def float_or_none(value: str) -> Optional[float]:
    if value.lower() in ("none", "null", ""):
        return None
    return float(value)


def str_or_none(value: str) -> Optional[str]:
    if value.lower() in ("none", "null", ""):
        return None
    return value
