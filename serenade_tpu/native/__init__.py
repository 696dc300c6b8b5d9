"""ctypes bindings for the native host-side DSP library (native/).

The library is the CPU-host counterpart of the JAX signal ops — the role
pyworld/pysptk's C code plays in the reference (SURVEY §0).  It builds on
first use if the `.so` is missing (g++ is part of the toolchain); callers
that can't build fall back to the JAX ops transparently via
``native_available()``.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libserenade_native.so"))
_lib: Optional[ctypes.CDLL] = None


def _rebuild() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return True
    except Exception:
        logger.warning("could not build native library", exc_info=True)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _rebuild():
        return None
    try:
        lib = _open_and_bind()
    except OSError:
        logger.warning("could not load %s", _LIB_PATH, exc_info=True)
        return None
    except AttributeError:
        # a loadable but STALE .so (built from older sources, missing
        # newer symbols): rebuild once — `make` replaces the file with a
        # new inode, so a fresh dlopen picks up the new library — and
        # fall back to the JAX ops if symbols are still missing
        logger.warning("stale %s (missing symbols); rebuilding", _LIB_PATH)
        if not _rebuild():
            return None
        try:
            lib = _open_and_bind()
        except (OSError, AttributeError):
            logger.warning("native library unusable after rebuild",
                           exc_info=True)
            return None
    _lib = lib
    return lib


def _open_and_bind() -> ctypes.CDLL:
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sn_yin_f0.restype = ctypes.c_int
    lib.sn_yin_f0.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.sn_freqt.restype = None
    lib.sn_freqt.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]
    lib.sn_harvest_f0.restype = ctypes.c_int
    lib.sn_harvest_f0.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.sn_cheaptrick.restype = ctypes.c_int
    lib.sn_cheaptrick.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    lib.sn_band_aperiodicity.restype = ctypes.c_int
    lib.sn_band_aperiodicity.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def native_available() -> bool:
    return _load() is not None


def yin_f0_native(
    audio: np.ndarray,
    fs: int = 24000,
    f0_floor: float = 60.0,
    f0_ceil: float = 1100.0,
    frame_period_ms: float = 10.0,
    threshold: float = 0.12,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native YIN; same contract as serenade_tpu.ops.f0.yin_f0."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    audio = np.ascontiguousarray(audio, np.float32)
    hop = int(fs * frame_period_ms / 1000.0)
    n_frames = 1 + len(audio) // hop
    f0 = np.zeros(n_frames, np.float32)
    vuv = np.zeros(n_frames, np.float32)
    ret = lib.sn_yin_f0(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(audio)), fs, f0_floor, f0_ceil, frame_period_ms,
        threshold,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vuv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ret != n_frames:
        raise RuntimeError(f"sn_yin_f0 failed (ret={ret})")
    return f0, vuv


def harvest_f0_native(
    audio: np.ndarray,
    fs: int = 24000,
    f0_floor: float = 60.0,
    f0_ceil: float = 1100.0,
    frame_period_ms: float = 10.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native Harvest-class F0; same contract (and algorithm) as
    serenade_tpu.ops.harvest.harvest_f0 — the role pyworld's C++ Harvest
    plays in the reference (preprocess.py:485-493), for CPU-only hosts."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    audio = np.ascontiguousarray(audio, np.float32)
    hop = int(fs * frame_period_ms / 1000.0)
    n_frames = 1 + len(audio) // hop
    f0 = np.zeros(n_frames, np.float32)
    vuv = np.zeros(n_frames, np.float32)
    ret = lib.sn_harvest_f0(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(audio)), fs, f0_floor, f0_ceil, frame_period_ms,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vuv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ret != n_frames:
        raise RuntimeError(f"sn_harvest_f0 failed (ret={ret})")
    return f0, vuv


def cheaptrick_native(
    audio: np.ndarray,
    f0: np.ndarray,
    fs: int = 24000,
    f0_floor: float = 71.0,
    frame_period_ms: float = 5.0,
    fft_size: Optional[int] = None,
) -> np.ndarray:
    """Native CheapTrick envelope; same contract (and algorithm) as
    serenade_tpu.ops.world.cheaptrick — the role pyworld's C++
    CheapTrick plays in the reference (ssc_postprocessing.py:167), for
    CPU-only hosts.  Returns (T, fft_size//2+1) float64."""
    import math

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if fft_size is None:
        fft_size = 1 << math.ceil(math.log2(3.0 * fs / f0_floor + 1.0))
    audio = np.ascontiguousarray(audio, np.float32)
    f0 = np.ascontiguousarray(np.asarray(f0).reshape(-1), np.float32)
    t = len(f0)
    out = np.zeros((t, fft_size // 2 + 1), np.float64)
    ret = lib.sn_cheaptrick(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(audio)), fs,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t,
        f0_floor, frame_period_ms, fft_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if ret != 0:
        raise RuntimeError(f"sn_cheaptrick failed (ret={ret})")
    return out


def band_aperiodicity_native(
    audio: np.ndarray,
    f0: np.ndarray,
    fs: int = 24000,
    frame_period_ms: float = 5.0,
) -> np.ndarray:
    """Native coarse band aperiodicity (dB); same contract as
    serenade_tpu.ops.world.band_aperiodicity — the coded-aperiodicity
    role of pyworld's D4C (ssc_postprocessing.py:167-171), for CPU-only
    hosts.  Returns (T, n_bands) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    audio = np.ascontiguousarray(audio, np.float32)
    f0 = np.ascontiguousarray(np.asarray(f0).reshape(-1), np.float32)
    t = len(f0)
    n_bands = int(min(15000.0, fs / 2.0 - 3000.0) // 3000.0)
    out = np.zeros((t, n_bands), np.float32)
    ret = lib.sn_band_aperiodicity(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(audio)), fs,
        f0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t,
        frame_period_ms,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ret != n_bands:
        raise RuntimeError(f"sn_band_aperiodicity failed (ret={ret})")
    return out


def freqt_native(c: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Native SPTK freqt; same contract as serenade_tpu.ops.sptk.freqt."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    c = np.ascontiguousarray(c, np.float64)
    squeeze = c.ndim == 1
    if squeeze:
        c = c[None]
    n_frames, in_len = c.shape
    out = np.zeros((n_frames, order + 1), np.float64)
    lib.sn_freqt(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_frames, in_len, order, alpha,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out[0] if squeeze else out
