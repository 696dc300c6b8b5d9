"""On-device F0 (fundamental frequency) estimation.

The reference leans on pyworld's Harvest (C++, CPU; preprocess.py:485-493,
utils/signal.py:108) — an offline, per-utterance bottleneck.  Here F0 is a
batched, jittable YIN-class estimator (cumulative mean normalized
difference + parabolic refinement + dip-based voicing), formulated as
framing + FFT cross-correlation so the whole utterance's frames evaluate in
parallel on the VPU/MXU instead of a sequential C++ loop.

Output contract matches the reference's Harvest usage: frame period in ms,
f0 in Hz with 0 at unvoiced frames, plus a separate vuv array
(preprocess.py:485-493 stores `f0` and `vuv = f0 != 0`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.partial(
    jax.jit, static_argnames=("fs", "f0_floor", "f0_ceil", "frame_period_ms",
                              "win_length", "threshold"),
)
def yin_f0(
    audio,
    fs: int = 24000,
    f0_floor: float = 60.0,
    f0_ceil: float = 1100.0,
    frame_period_ms: float = 10.0,
    win_length: int | None = None,
    threshold: float = 0.12,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate (f0, vuv) at ``frame_period_ms`` hop.

    Returns:
        f0: (n_frames,) Hz, 0 where unvoiced.
        vuv: (n_frames,) float 0/1 voicing.
    """
    hop = int(fs * frame_period_ms / 1000.0)
    max_lag = int(np.ceil(fs / f0_floor)) + 1
    min_lag = max(int(np.floor(fs / f0_ceil)), 2)
    W = win_length or _next_pow2(max_lag * 2)

    frame_len = W + max_lag
    n_frames = 1 + audio.shape[0] // hop
    pad = frame_len
    x = jnp.pad(audio.astype(jnp.float32), (pad // 2, pad), mode="constant")
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    frames = x[idx]  # (N, W + max_lag)

    # r(tau) = sum_{t<W} x[t] x[t+tau] via FFT cross-correlation
    nfft = _next_pow2(frame_len + W)
    head = frames[:, :W]
    fa = jnp.fft.rfft(head, nfft)
    fb = jnp.fft.rfft(frames, nfft)
    corr = jnp.fft.irfft(jnp.conj(fa) * fb, nfft)[:, :max_lag]  # (N, L)

    # p(tau) = sum_{t=tau}^{tau+W-1} x[t]^2 (running energy)
    sq = jnp.square(frames)
    csum = jnp.concatenate(
        [jnp.zeros((n_frames, 1), jnp.float32), jnp.cumsum(sq, axis=1)], axis=1
    )
    taus = jnp.arange(max_lag)
    p_tau = csum[:, taus + W] - csum[:, taus]
    p_0 = p_tau[:, :1]

    d = p_0 + p_tau - 2.0 * corr  # difference function (N, L)
    # cumulative mean normalized difference
    cum = jnp.cumsum(d[:, 1:], axis=1)
    tau_idx = jnp.arange(1, max_lag, dtype=jnp.float32)
    cmnd = jnp.concatenate(
        [jnp.ones((n_frames, 1), jnp.float32),
         d[:, 1:] * tau_idx / jnp.maximum(cum, 1e-12)],
        axis=1,
    )

    # restrict to the plausible lag band
    lag_mask = (taus >= min_lag) & (taus < max_lag - 1)
    cmnd_band = jnp.where(lag_mask[None, :], cmnd, jnp.inf)

    # first dip under threshold; else global min (YIN absolute threshold step)
    below = cmnd_band < threshold
    any_below = jnp.any(below, axis=1)
    first_below = jnp.argmax(below, axis=1)
    global_min = jnp.argmin(cmnd_band, axis=1)
    raw_tau = jnp.where(any_below, first_below, global_min)

    # local minimum walk: advance while the next bin keeps descending
    def refine_local(tau, row):
        def cond(t):
            return (t + 1 < max_lag - 1) & (row[t + 1] < row[t])

        def body(t):
            return t + 1

        return jax.lax.while_loop(cond, body, tau)

    raw_tau = jax.vmap(refine_local)(raw_tau, cmnd_band)

    # parabolic interpolation around the dip
    t0 = jnp.clip(raw_tau, min_lag, max_lag - 2)
    ym1 = jnp.take_along_axis(cmnd, (t0 - 1)[:, None], axis=1)[:, 0]
    y0 = jnp.take_along_axis(cmnd, t0[:, None], axis=1)[:, 0]
    yp1 = jnp.take_along_axis(cmnd, (t0 + 1)[:, None], axis=1)[:, 0]
    denom = ym1 - 2.0 * y0 + yp1
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (ym1 - yp1) / denom, 0.0)
    tau_star = t0.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

    f0 = fs / jnp.maximum(tau_star, 1.0)
    dip_val = y0
    # voicing: a convincing dip + actual signal energy
    energy = p_0[:, 0] / W
    vuv = (
        (dip_val < jnp.maximum(threshold * 2.5, 0.35))
        & (energy > 1e-7)
        & (f0 >= f0_floor)
        & (f0 <= f0_ceil)
    ).astype(jnp.float32)
    f0 = jnp.where(vuv > 0, f0, 0.0)
    return f0, vuv


def _cmnd_matrix(audio, fs, f0_floor, f0_ceil, frame_period_ms, win_length):
    """Shared YIN front half: returns (cmnd (N,L), min_lag, max_lag, energy)."""
    hop = int(fs * frame_period_ms / 1000.0)
    max_lag = int(np.ceil(fs / f0_floor)) + 1
    min_lag = max(int(np.floor(fs / f0_ceil)), 2)
    W = win_length or _next_pow2(max_lag * 2)

    frame_len = W + max_lag
    n_frames = 1 + audio.shape[0] // hop
    pad = frame_len
    x = jnp.pad(audio.astype(jnp.float32), (pad // 2, pad), mode="constant")
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    frames = x[idx]

    nfft = _next_pow2(frame_len + W)
    head = frames[:, :W]
    fa = jnp.fft.rfft(head, nfft)
    fb = jnp.fft.rfft(frames, nfft)
    corr = jnp.fft.irfft(jnp.conj(fa) * fb, nfft)[:, :max_lag]

    sq = jnp.square(frames)
    csum = jnp.concatenate(
        [jnp.zeros((n_frames, 1), jnp.float32), jnp.cumsum(sq, axis=1)],
        axis=1,
    )
    taus = jnp.arange(max_lag)
    p_tau = csum[:, taus + W] - csum[:, taus]
    p_0 = p_tau[:, :1]
    d = p_0 + p_tau - 2.0 * corr
    cum = jnp.cumsum(d[:, 1:], axis=1)
    tau_idx = jnp.arange(1, max_lag, dtype=jnp.float32)
    cmnd = jnp.concatenate(
        [jnp.ones((n_frames, 1), jnp.float32),
         d[:, 1:] * tau_idx / jnp.maximum(cum, 1e-12)],
        axis=1,
    )
    return cmnd, min_lag, max_lag, p_0[:, 0] / W


@functools.partial(
    jax.jit,
    static_argnames=("fs", "f0_floor", "f0_ceil", "frame_period_ms",
                     "win_length", "n_candidates"),
)
def yin_f0_viterbi(
    audio,
    fs: int = 24000,
    f0_floor: float = 60.0,
    f0_ceil: float = 1100.0,
    frame_period_ms: float = 10.0,
    win_length: int | None = None,
    n_candidates: int = 5,
    voiced_bias: float = 0.35,
    transition_octave_cost: float = 6.0,
    switch_cost: float = 0.4,
    lag_octave_penalty: float = 0.02,
):
    """YIN + Viterbi continuity decoding (pYIN-style).

    Per frame the K best CMND dips become voiced candidates plus one
    unvoiced state; the Viterbi path minimizes dip depth + octave-jump
    transition cost — suppressing the octave errors plain peak-picking
    makes on breathy/weak phonation.  Fully jittable (`lax.scan` over
    frames with a (K+1)-state trellis).

    Returns (f0, vuv) like ``yin_f0``.
    """
    cmnd, min_lag, max_lag, energy = _cmnd_matrix(
        audio, fs, f0_floor, f0_ceil, frame_period_ms, win_length
    )
    n_frames, L = cmnd.shape
    taus = jnp.arange(L)
    band = (taus >= min_lag) & (taus < max_lag - 1)
    c_band = jnp.where(band[None, :], cmnd, jnp.inf)

    # Parabolic interpolation of the dip depth at EVERY lag: a non-integer
    # true period (54.5 samples at 440 Hz/24 kHz) leaves a shallow grid dip
    # at tau0 while 2*tau0 lands on-grid and dips deeper — interpolated
    # minima remove that discretization bias before candidate selection.
    ym1 = jnp.pad(cmnd[:, :-1], ((0, 0), (1, 0)), constant_values=jnp.inf)
    yp1 = jnp.pad(cmnd[:, 1:], ((0, 0), (0, 1)), constant_values=jnp.inf)
    y0 = cmnd
    denom_all = ym1 - 2.0 * y0 + yp1
    safe_denom = jnp.where(jnp.abs(denom_all) > 1e-12, denom_all, 1.0)
    delta_all = jnp.clip(0.5 * (ym1 - yp1) / safe_denom, -1.0, 1.0)
    interp_all = jnp.maximum(y0 - 0.125 * jnp.square(ym1 - yp1) / safe_denom,
                             0.0)
    is_min = (c_band <= jnp.where(jnp.isinf(ym1), jnp.inf, ym1)) & \
             (c_band < jnp.where(jnp.isinf(yp1), jnp.inf, yp1))
    # YIN's smallest-lag preference: dips at tau0, 2*tau0, ... are all ~0
    # for periodic signals; a mild per-octave lag penalty breaks the tie
    # toward the true period without overriding genuinely deeper dips
    lag_pen = lag_octave_penalty * jnp.log2(
        jnp.maximum(taus.astype(jnp.float32), 1.0) / float(min_lag)
    )
    score = jnp.where(is_min & band[None, :], interp_all + lag_pen[None, :],
                      jnp.inf)
    neg_vals, cand_tau = jax.lax.top_k(-score, n_candidates)
    cand_cost = -neg_vals  # (N, K) penalized dip depth (inf where absent)

    t0 = jnp.clip(cand_tau, min_lag, max_lag - 2)
    tau_star = t0.astype(jnp.float32) + jnp.take_along_axis(
        delta_all, t0, axis=1
    )
    cand_f0 = fs / jnp.maximum(tau_star, 1.0)  # (N, K)

    valid = jnp.isfinite(cand_cost) & (energy[:, None] > 1e-7)
    emission_voiced = jnp.where(valid, cand_cost, 1e6)  # (N, K)
    return viterbi_f0_select(
        cand_f0, emission_voiced,
        voiced_bias=voiced_bias,
        transition_octave_cost=transition_octave_cost,
        switch_cost=switch_cost,
        f0_floor=f0_floor, f0_ceil=f0_ceil,
    )


def viterbi_f0_select(
    cand_f0,
    emission_voiced,
    *,
    voiced_bias: float,
    transition_octave_cost: float,
    switch_cost: float,
    f0_floor: float,
    f0_ceil: float,
):
    """Shared (K+1)-state V/UV trellis: per frame K voiced candidates with
    emission costs plus one unvoiced state at fixed cost ``voiced_bias``;
    the path minimizes emission + octave-jump + V/UV-switch costs.  Used by
    both the YIN and Harvest candidate generators.

    Args:
        cand_f0: (N, K) candidate frequencies in Hz.
        emission_voiced: (N, K) candidate costs (use ~1e6 for absent ones).

    Returns (f0, vuv) with f0=0 at unvoiced frames.
    """
    n_frames, n_candidates = cand_f0.shape
    log_f0 = jnp.log2(jnp.maximum(cand_f0, 1.0))
    # unvoiced state: fixed emission = voiced_bias (a candidate must beat it)
    emission = jnp.concatenate(
        [emission_voiced, jnp.full((n_frames, 1), voiced_bias)], axis=1
    )  # (N, K+1)
    logf = jnp.concatenate(
        [log_f0, jnp.zeros((n_frames, 1))], axis=1
    )
    is_voiced_state = jnp.concatenate(
        [jnp.ones((n_frames, n_candidates)), jnp.zeros((n_frames, 1))],
        axis=1,
    )

    def transition(prev_logf, prev_voiced, cur_logf, cur_voiced):
        # (K+1, K+1) cost from prev state i to cur state j
        jump = jnp.abs(cur_logf[None, :] - prev_logf[:, None])
        both_voiced = prev_voiced[:, None] * cur_voiced[None, :]
        switch = (prev_voiced[:, None] - cur_voiced[None, :]) ** 2
        return transition_octave_cost * jump * both_voiced + switch_cost * switch

    def step(carry, xs):
        cost_prev, lf_prev, v_prev = carry
        em, lf, vo = xs
        trans = transition(lf_prev, v_prev, lf, vo)
        total = cost_prev[:, None] + trans + em[None, :]
        best_prev = jnp.argmin(total, axis=0)
        cost = jnp.min(total, axis=0)
        return (cost, lf, vo), best_prev

    init = (emission[0], logf[0], is_voiced_state[0])
    (final_cost, _, _), backptrs = jax.lax.scan(
        step, init, (emission[1:], logf[1:], is_voiced_state[1:])
    )

    # backtrace
    last = jnp.argmin(final_cost)

    def back(state, bp):
        prev = bp[state]
        return prev, state

    # reverse scan emits the state at frame i+1 for backptrs[i]; the final
    # carry is the state at frame 0
    first, states_tail = jax.lax.scan(back, last, backptrs, reverse=True)
    states = jnp.concatenate([jnp.array([first]), states_tail])

    f0 = jnp.take_along_axis(
        jnp.concatenate([cand_f0, jnp.zeros((n_frames, 1))], axis=1),
        states[:, None], axis=1,
    )[:, 0]
    voiced = states < n_candidates
    f0 = jnp.where(voiced & (f0 >= f0_floor) & (f0 <= f0_ceil), f0, 0.0)
    return f0, (f0 > 0).astype(jnp.float32)


def smooth_f0_median(f0, width: int = 5):
    """Median smoothing over voiced runs (0s preserved)."""
    pad = width // 2
    padded = jnp.pad(f0, (pad, pad), mode="edge")
    idx = jnp.arange(f0.shape[0])[:, None] + jnp.arange(width)[None, :]
    windows = padded[idx]
    med = jnp.median(windows, axis=1)
    return jnp.where(f0 > 0, med, 0.0)


def world_extract_compatible(audio, fs: int, f0min: float, f0max: float,
                             frame_period_ms: float = 10.0):
    """Signature-compatible replacement for reference utils/signal.py:108
    ``world_extract`` F0 path (Harvest-class): returns (f0, vuv)."""
    f0, vuv = yin_f0(
        audio, fs=fs, f0_floor=float(f0min), f0_ceil=float(f0max),
        frame_period_ms=frame_period_ms,
    )
    f0 = smooth_f0_median(f0)
    vuv = (f0 > 0).astype(jnp.float32)
    return np.asarray(f0), np.asarray(vuv)
