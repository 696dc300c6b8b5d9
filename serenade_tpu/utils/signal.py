"""Signal-processing helpers (reference utils/signal.py API surface).

``low_cut_filter`` (signal.py:13) and a WORLD-style ``world_extract``
(signal.py:108) backed by the TPU-native analysis ops instead of
pyworld: YIN-class F0 + CheapTrick envelope + band aperiodicity.
"""

from __future__ import annotations

import numpy as np

from serenade_tpu.utils.audio import low_cut_filter  # noqa: F401


def world_extract(
    x: np.ndarray,
    fs: int,
    f0min: float = 70.0,
    f0max: float = 1100.0,
    shiftms: float = 5.0,
    fft_size: int | None = None,
):
    """Full WORLD-class analysis: returns (f0, spc, ap, vuv).

    Same role as reference utils/signal.py:108-130 (harvest + cheaptrick +
    d4c via pyworld); here batched on-device.
    """
    import jax.numpy as jnp

    from serenade_tpu.ops.f0 import smooth_f0_median, yin_f0
    from serenade_tpu.ops.world import (
        aperiodicity_spectrum,
        band_aperiodicity,
        cheaptrick,
    )

    x = np.asarray(x, np.float32)
    f0, _ = yin_f0(jnp.asarray(x), fs=fs, f0_floor=float(f0min),
                   f0_ceil=float(f0max), frame_period_ms=shiftms)
    f0 = np.asarray(smooth_f0_median(f0))
    spc = np.asarray(cheaptrick(jnp.asarray(x), jnp.asarray(f0), fs=fs,
                                frame_period_ms=shiftms))
    bap = np.asarray(band_aperiodicity(jnp.asarray(x), jnp.asarray(f0),
                                       fs=fs, frame_period_ms=shiftms))
    fft_size = (spc.shape[1] - 1) * 2
    ap = aperiodicity_spectrum(bap, fs, fft_size)
    vuv = (f0 > 0).astype(np.float32)
    return f0, spc, ap, vuv
