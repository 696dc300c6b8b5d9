"""End-of-round benchmark: the BASELINE.md config ladder on one chip.

Headline: single-utterance SSC conversion RTF — the full hot path of
`serenade-decode` (reference ssc_decode.py:428-455): content encoding + GST
+ 10-step Euler CFM over the packed reference+source sequence + HiFiGAN
vocoding, flagship full-size model in bfloat16.

`details` carries the rest of the ladder (BASELINE.md "Targets" 1-5):
  train_steps_per_sec / train_mfu   — full train step, eff. batch 16
  vocoder_samples_per_sec           — HiFiGAN synthesis throughput
  feature_frames_per_sec            — on-device mel+loudness+F0 extraction
  batched_decode_audio_sec_per_sec  — batched full-corpus decode (config 4)
  e2e_with_features_rtf             — conversion RTF including on-device
                                      feature extraction (north-star claim)
  flash_vs_xla                      — attention backend ms at decode shapes

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.
``vs_baseline`` is the north-star ratio target/value (BASELINE.md: e2e
conversion RTF < 0.05 on v5e-8 — here measured per single chip), so
vs_baseline > 1.0 beats the target.
"""

from __future__ import annotations

import json
import os
import time

import jax

# reuse compiled programs across bench invocations (first compile of the
# 10-step CFM scan is minutes; subsequent runs hit this cache)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

FRAME_MS = 10.0          # feature frame period (conf/serenade.yaml:8)
SR = 24000
HOP = 240
SRC_FRAMES = 1024        # ~10.2 s source utterance
REF_FRAMES = 512         # ~5.1 s style reference
N_TIMESTEPS = 10         # reference flow_matching.py:40
RTF_TARGET = 0.05        # BASELINE.md north star

# bf16 peak per chip for MFU (TPU v5e ≈ 197 TFLOP/s; v4 ≈ 275; v6e ≈ 918)
_PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v6 lite": 918e12}


def _barrier(out):
    """Force completion by fetching a scalar from the result.  Through the
    axon tunnel `block_until_ready` returns before the remote execution
    finishes, but a host fetch cannot; the device executes in order, so
    fetching from the LAST result is a barrier for the whole loop."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf[(0,) * leaf.ndim]).astype(jnp.float32))


def _timeit(fn, n=10, warmup_rounds=2, i0=0):
    """Time fn(i) over n iterations (steady state).

    ``fn`` MUST vary its dispatched arguments with ``i``: the axon stack
    dedupes executions whose program and operands are identical, which
    makes repeated identical calls measure ~0.  ``i0`` offsets the
    iteration indices so repeated measurements dispatch fresh operands.
    """
    for r in range(warmup_rounds):
        _barrier(fn(1000 * (r + 1) + i0))
    t0 = time.perf_counter()
    out = None
    for i in range(i0, i0 + n):
        out = fn(i)
    _barrier(out)
    return (time.perf_counter() - t0) / n


def _timeit_rep(fn, n=10, repeats=3):
    """Repeat ``_timeit`` with disjoint operand indices; returns
    (mean_elapsed, rel_std) — the measured tunnel noise for this metric
    (ROADMAP measurement notes: ±30-50% for sub-10 ms kernels), recorded
    so round-over-round diffs can tell regression from jitter."""
    times = [
        _timeit(fn, n=n, warmup_rounds=2 if r == 0 else 0,
                i0=10_000 + 1_000 * r)
        for r in range(repeats)
    ]
    arr = np.asarray(times)
    return float(arr.mean()), float(arr.std() / arr.mean())


# direction of improvement per metric-name suffix/stem, for vs_prev
_LOWER_IS_BETTER = ("_rtf", "rtf_")


def _metric_better_when_lower(key: str) -> bool:
    return any(tok in key for tok in _LOWER_IS_BETTER)


def _diff_vs_prev(details: dict, variance: dict, headline_key: str,
                  headline_value: float, prev_path: str = None):
    """Compare this run's numeric metrics against the latest BENCH_r*.json
    (VERDICT r3 item 3).  A metric REGRESSES when it moves in the worse
    direction by more than its noise band: 2x the rel_std measured THIS
    run (floored at 10%), else a 30% default for unmeasured short
    kernels."""
    import glob
    import re

    if prev_path is None:
        root = os.path.dirname(os.path.abspath(__file__))
        files = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                       key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
        if not files:
            return None
        prev_path = files[-1]
    with open(prev_path) as fh:
        prev = json.load(fh)
    # the driver's BENCH_r*.json wraps the bench line under "parsed"
    prev = prev.get("parsed", prev)
    prev_flat = {prev.get("metric", "headline"): prev.get("value")}
    for k, v in (prev.get("details") or {}).items():
        if isinstance(v, (int, float)):
            prev_flat[k] = float(v)

    cur_flat = {headline_key: headline_value}
    cur_flat.update({k: float(v) for k, v in details.items()
                     if isinstance(v, (int, float))})

    invalid = set(details.get("host_side_metrics_invalid") or [])
    degraded = bool(details.get("tunnel_degraded"))
    deltas, regressions = {}, {}
    for k, new in cur_flat.items():
        old = prev_flat.get(k)
        if old is None or old == 0:
            continue
        rel = (new - old) / abs(old)
        deltas[k] = round(rel, 4)
        if k in invalid:  # measured under host contention: delta only
            continue
        if degraded:  # tunnel-degraded window: deltas only, no flags
            continue
        if k in ("tunnel_rtt_ms", "host_load_1min_at_start"):
            continue  # diagnostics, not perf metrics

        worse = -rel if _metric_better_when_lower(k) else rel
        noise = max(2.0 * variance.get(k, 0.15), 0.10)
        if worse < -noise:
            regressions[k] = {
                "prev": old, "now": new, "rel_change": round(rel, 4),
                "noise_band": round(noise, 4),
            }
    out = {
        "prev_file": os.path.basename(prev_path),
        "deltas": deltas,
        "regressions": regressions,
    }
    if degraded:
        out["regressions_suppressed"] = (
            "tunnel_degraded: rtt floor far above the dispatch floor; "
            "see details.tunnel_rtt_ms")
    return out


def bench_conversion(model, vocoder, params, voc_params):
    """Headline: decode hot path RTF (BASELINE config 3)."""
    b, ts, tr = 1, SRC_FRAMES, REF_FRAMES
    ks = jax.random.split(jax.random.key(0), 10)
    src = dict(
        x=jax.random.normal(ks[0], (b, ts, 768)),
        lengths=jnp.array([ts - 24]),
        midi=jax.random.uniform(ks[1], (b, ts, 1)),
        loud=jax.random.uniform(ks[2], (b, ts, 1)),
    )
    ref = dict(
        ref_x=jax.random.normal(ks[3], (b, tr, 768)),
        ref_lengths=jnp.array([tr - 16]),
        ref_logmel=jax.random.normal(ks[4], (b, tr, 80)),
        ref_midi=jax.random.uniform(ks[5], (b, tr, 1)),
        ref_loud=jax.random.uniform(ks[6], (b, tr, 1)),
    )

    @jax.jit
    def convert(params, src, ref, key):
        return model.apply(
            params, src["x"], src["lengths"], src["midi"], src["loud"],
            ref["ref_x"], ref["ref_lengths"], ref["ref_logmel"],
            ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=N_TIMESTEPS, method="inference",
        )

    @jax.jit
    def convert_fast(params, src, ref, key):
        # QUALITY-EQUIVALENT fast mode: 2nd-order AB2 at 7 steps BEATS
        # 10-step Euler accuracy-to-converged-flow at 70% of the UNet
        # evaluations (measured on a trained field, tests/test_cfm_solvers
        # ::test_solver_quality_on_trained_field: MCD 0.23 vs 0.32 dB;
        # ab2-5 is the half-cost mode trading ~+0.2 dB)
        return model.apply(
            params, src["x"], src["lengths"], src["midi"], src["loud"],
            ref["ref_x"], ref["ref_lengths"], ref["ref_logmel"],
            ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=7, solver="ab2", method="inference",
        )

    @jax.jit
    def convert_distilled(params, src, ref, key):
        # the serenade-distill sampler: 2 Euler steps on a distilled
        # (rectified/endpoint-matched) field.  Its COST is weight-
        # independent so random params measure the true RTF; quality is
        # checkpoint-dependent and quantified separately
        # (tests/test_distill.py: distilled euler-2 lands ~0.45 dB MCD
        # from the converged flow on a trained field)
        return model.apply(
            params, src["x"], src["lengths"], src["midi"], src["loud"],
            ref["ref_x"], ref["ref_lengths"], ref["ref_logmel"],
            ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=2, solver="euler", method="inference",
        )

    from serenade_tpu.quantize import dequantize_tree, quantize_tree

    @jax.jit
    def convert_int8(params_q, src, ref, key):
        # weight-only int8 serving mode: weights cross HBM as int8 (1/4
        # the f32 bytes) and dequantize in-program; batch-1 conversion is
        # weight-bandwidth-bound, so this measures the bandwidth win.
        # Quality bound: tests/test_quantize.py (MCD vs f32 weights)
        return model.apply(
            dequantize_tree(params_q), src["x"], src["lengths"],
            src["midi"], src["loud"], ref["ref_x"], ref["ref_lengths"],
            ref["ref_logmel"], ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=N_TIMESTEPS, method="inference",
        )

    from serenade_tpu.quantize import quantize_dense_tree

    @jax.jit
    def convert_int8_compute(params_qc, src, ref, key):
        # int8 COMPUTE mode: the estimator's 2-D matmuls run int8*int8 on
        # the MXU via QDense (weights stay int8 in HBM inside the scan —
        # nothing hoists, unlike the weight-only mode).  Quality bound:
        # tests/test_quantize.py::test_converter_int8_compute_quality
        return model.apply(
            params_qc, src["x"], src["lengths"],
            src["midi"], src["loud"], ref["ref_x"], ref["ref_lengths"],
            ref["ref_logmel"], ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=N_TIMESTEPS, method="inference",
        )

    @jax.jit
    def convert_int8_compute_e2(params_qc, src, ref, key):
        # int8 compute under the distilled 2-step sampler: the two levers
        # compose — this is the candidate new RTF floor
        return model.apply(
            params_qc, src["x"], src["lengths"],
            src["midi"], src["loud"], ref["ref_x"], ref["ref_lengths"],
            ref["ref_logmel"], ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=2, solver="euler", method="inference",
        )

    params_q = jax.jit(quantize_tree)(params)
    params_qc = jax.jit(quantize_dense_tree)(params)
    vocode = jax.jit(lambda vp, mel: vocoder.apply(vp, mel))

    elapsed, rel_std = _timeit_rep(
        lambda i: vocode(voc_params,
                         convert(params, src, ref,
                                 jax.random.fold_in(ks[8], i))), n=10)
    audio_seconds = int(src["lengths"][0]) * FRAME_MS / 1000.0
    elapsed_fast = _timeit(
        lambda i: vocode(voc_params,
                         convert_fast(params, src, ref,
                                      jax.random.fold_in(ks[9], i))), n=10)
    elapsed_distilled = _timeit(
        lambda i: vocode(voc_params,
                         convert_distilled(params, src, ref,
                                           jax.random.fold_in(ks[7], i))),
        n=10)
    elapsed_int8 = _timeit(
        lambda i: vocode(voc_params,
                         convert_int8(params_q, src, ref,
                                      jax.random.fold_in(ks[8], i + 777))),
        n=10)
    elapsed_int8c = _timeit(
        lambda i: vocode(voc_params,
                         convert_int8_compute(
                             params_qc, src, ref,
                             jax.random.fold_in(ks[8], i + 1555))),
        n=10)
    elapsed_int8c_e2 = _timeit(
        lambda i: vocode(voc_params,
                         convert_int8_compute_e2(
                             params_qc, src, ref,
                             jax.random.fold_in(ks[8], i + 2333))),
        n=10)
    return (elapsed / audio_seconds, elapsed_fast / audio_seconds,
            elapsed_distilled / audio_seconds, elapsed_int8 / audio_seconds,
            elapsed_int8c / audio_seconds, elapsed_int8c_e2 / audio_seconds,
            rel_std)


def bench_train(model_f32, opt_params=None, t=512, gather=False,
                flops_hint=None, n_iters=30):
    """Config 5: full train step (UNet+GST, grad+clip+AdamW) at the
    reference effective batch 16; returns (steps/sec, MFU).

    ``opt_params`` overrides optimizer_params (e.g. mu_dtype probes).
    ``t`` sets the bucket length: 512 is the historical bench shape,
    1280 the real-length bucket top the full-budget run trains at
    (VERDICT r4 item 5 — MFU at the shape training actually runs).
    ``gather=True`` drives the step through the device-resident corpus
    gather (datasets/device_cache.py), the exact two-dispatch path the
    trainer uses, so the gather's cost is measured rather than assumed;
    its MFU uses ``flops_hint`` (the plain step's XLA flop count)."""
    from serenade_tpu.trainers import (
        build_optimizer, build_train_step, create_train_state,
    )

    b = 16
    ks = jax.random.split(jax.random.key(1), 5)
    batch = dict(
        x=jax.random.normal(ks[0], (b, t, 768)),
        lengths=jnp.full((b,), t, jnp.int32).at[1:].set(t - 37),
        logmel=jax.random.normal(ks[1], (b, t, 80)),
        midi=jax.random.uniform(ks[2], (b, t, 1)),
        loud=jax.random.uniform(ks[3], (b, t, 1)),
    )
    params = jax.jit(
        lambda bt: model_f32.init(
            {"params": jax.random.key(2)}, bt["x"], bt["lengths"],
            bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(3),
            deterministic=True,
        )
    )(batch)
    config = {
        "optimizer_type": "AdamW",
        "optimizer_params": dict(opt_params or {"lr": 8e-4}),
        "scheduler_type": "MultiStepLR",
        "scheduler_params": {"gamma": 0.5, "milestones": [100000]},
        "grad_norm": 1.0,
    }
    tx, _ = build_optimizer(config)
    state = create_train_state(params, tx)
    step_fn = build_train_step(model_f32, tx, donate=False)

    # XLA's own flop count for the whole step program
    flops = flops_hint
    if flops is None:
        try:
            lowered = step_fn.lower(state, batch, jax.random.key(4))
            cost = lowered.compile().cost_analysis()
            if cost:
                c = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(c.get("flops", 0.0)) or None
        except Exception:
            flops = None

    if gather:
        from serenade_tpu.datasets.device_cache import DeviceResidentData

        rng = np.random.default_rng(3)
        corpus = [
            {"hubert": rng.standard_normal(
                 (int(rng.integers(int(0.7 * t), t)), 768)).astype(
                     np.float32),
             "logmel": None, "score": None, "loud": None}
            for _ in range(48)
        ]
        for item in corpus:
            ln = item["hubert"].shape[0]
            item["logmel"] = rng.standard_normal((ln, 80)).astype(np.float32)
            item["score"] = rng.random((ln, 1), np.float32)
            item["loud"] = rng.random((ln, 1), np.float32)
        data = DeviceResidentData(corpus, pad_frames_to=t, batch_size=b)
        wrapped = data.wrap_step(step_fn)

        def run(i):
            idx = ((np.arange(b, dtype=np.int32) * 5 + i) % data.n)
            return wrapped(state, {"indices": idx}, jax.random.fold_in(
                jax.random.key(5), i))
    else:
        def run(i):
            return step_fn(state, batch,
                           jax.random.fold_in(jax.random.key(5), i))

    # ~1 s of steady state per repeat: ±5% tunnel jitter at n=10 moved
    # the headline MFU more than any real change between rounds
    elapsed, rel_std = _timeit_rep(run, n=n_iters)
    steps_per_sec = 1.0 / elapsed
    mfu = None
    if flops:
        kind = jax.devices()[0].device_kind
        peak = _PEAK_BF16.get(kind)
        if peak:
            mfu = flops * steps_per_sec / peak
    return steps_per_sec, mfu, flops, rel_std


def bench_vocoder(vocoder, voc_params):
    """Config 2-adjacent: HiFiGAN synthesis samples/sec/chip at the
    representative utterance length (SRC_FRAMES, ~10 s; longer audio goes
    through ops/longform chunking)."""
    mel = jax.random.normal(jax.random.key(6), (1, SRC_FRAMES, 80))
    vocode = jax.jit(lambda vp, m: vocoder.apply(vp, m))
    # i-dependent perturbation keeps every dispatch distinct (see _timeit);
    # 5x10 iterations: this short kernel was the round-3 false-regression
    # suspect, so it gets the widest variance measurement
    elapsed, rel_std = _timeit_rep(
        lambda i: vocode(voc_params, mel + jnp.float32(i) * 1e-6),
        n=10, repeats=5)
    return SRC_FRAMES * HOP / elapsed, rel_std


def _feature_fn():
    """Jitted mel + loudness + YIN-Viterbi F0 from a raw waveform
    (the on-device replacement for librosa+pyworld preprocessing)."""
    from serenade_tpu.ops.f0 import yin_f0_viterbi
    from serenade_tpu.ops.mel import logmelfilterbank, loudness_extract

    @jax.jit
    def fn(wav):
        logmel = logmelfilterbank(wav, SR, fft_size=512, hop_size=HOP,
                                  win_length=None, num_mels=80)
        loud = loudness_extract(wav, SR, HOP)
        f0, vuv = yin_f0_viterbi(wav, SR, f0_floor=80.0, f0_ceil=1000.0,
                                 frame_period_ms=FRAME_MS)
        return {"logmel": logmel, "loud": loud, "f0": f0, "vuv": vuv}

    return fn


def bench_features():
    """Config 1: on-device mel+loudness+F0 extraction frames/sec — single
    utterance and the vmapped 8-utterance group the preprocess CLI uses
    (serenade_tpu/features.py extract_features_batch)."""
    n = SR * 10  # 10 s utterance
    wav = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220.0 * np.arange(n) / SR), jnp.float32)
    fn = _feature_fn()
    elapsed = _timeit(lambda i: fn(wav + jnp.float32(i) * 1e-9), n=5)
    frames = n // HOP

    from serenade_tpu.features import _signal_program

    grp = _signal_program(SR, 512, HOP, 480, 80, 63.0, 12000.0, 1e-6, 10.0,
                          FRAME_MS, 70.0, 1100.0, "viterbi")
    batch = jnp.tile(wav[None], (8, 1))
    el8 = _timeit(lambda i: grp(batch + jnp.float32(i) * 1e-9), n=5)
    return frames / elapsed, 8 * frames / el8


def bench_harvest():
    """Harvest-backend F0 frames/sec (the reference's own algorithm on
    device; the YIN-Viterbi default is benched in bench_features)."""
    from serenade_tpu.ops.harvest import harvest_f0

    n = SR * 10
    t = np.arange(n) / SR
    f0t = 220.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
    ph = 2 * np.pi * np.cumsum(f0t) / SR
    wav = jnp.asarray(sum((0.5 / h) * np.sin(h * ph) for h in range(1, 6)),
                      jnp.float32)
    fn = jax.jit(lambda w: harvest_f0(w, SR, f0_floor=80.0, f0_ceil=800.0,
                                      frame_period_ms=FRAME_MS)[0])
    elapsed, rel_std = _timeit_rep(
        lambda i: fn(wav + jnp.float32(i) * 1e-9), n=5, repeats=5)
    return (n // HOP) / elapsed, rel_std


def bench_batched_decode(model, params):
    """Config 4: batched full-corpus decode throughput (audio-sec/sec) —
    the reference is locked to batch=1 (serenade.py:208-218); batching is
    the TPU win."""
    b, ts, tr = 8, SRC_FRAMES, REF_FRAMES
    ks = jax.random.split(jax.random.key(7), 10)
    lengths = jnp.full((b,), ts, jnp.int32).at[1:].set(ts - 100)

    @jax.jit
    def convert(params, key):
        return model.apply(
            params,
            jax.random.normal(ks[0], (b, ts, 768)), lengths,
            jax.random.uniform(ks[1], (b, ts, 1)),
            jax.random.uniform(ks[2], (b, ts, 1)),
            jax.random.normal(ks[3], (b, tr, 768)),
            jnp.full((b,), tr - 16, jnp.int32),
            jax.random.normal(ks[4], (b, tr, 80)),
            jax.random.uniform(ks[5], (b, tr, 1)),
            jax.random.uniform(ks[6], (b, tr, 1)),
            rng=key, n_timesteps=N_TIMESTEPS, method="inference",
        )

    elapsed = _timeit(
        lambda i: convert(params, jax.random.fold_in(ks[8], i)), n=5)
    audio_sec = float(jnp.sum(lengths)) * FRAME_MS / 1000.0
    return audio_sec / elapsed


def bench_e2e_with_features(model, vocoder, params, voc_params):
    """North-star claim: conversion RTF including on-device feature
    extraction — mel/loudness/F0 run from the raw waveform inside the same
    jitted program as the CFM sampler and vocoder (content features are
    precomputed-shape inputs, as in the reference decode path which reads
    them from h5)."""
    n = SRC_FRAMES * HOP
    wav = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220.0 * np.arange(n) / SR), jnp.float32)
    feat_fn = _feature_fn()

    b, ts, tr = 1, SRC_FRAMES, REF_FRAMES
    ks = jax.random.split(jax.random.key(8), 10)
    x = jax.random.normal(ks[0], (b, ts, 768))
    ref = (
        jax.random.normal(ks[3], (b, tr, 768)),
        jnp.array([tr - 16]),
        jax.random.normal(ks[4], (b, tr, 80)),
        jax.random.uniform(ks[5], (b, tr, 1)),
        jax.random.uniform(ks[6], (b, tr, 1)),
    )

    def _fit(a):
        """Pad/trim a per-frame stream to exactly SRC_FRAMES (static)."""
        if a.shape[0] < SRC_FRAMES:
            a = jnp.pad(a, (0, SRC_FRAMES - a.shape[0]))
        return a[:SRC_FRAMES].reshape(1, SRC_FRAMES, 1)

    @jax.jit
    def full(params, voc_params, wav, key):
        feats = feat_fn(wav)
        midi = _fit(feats["f0"])
        loud = _fit(feats["loud"])
        mel = model.apply(
            params, x, jnp.array([SRC_FRAMES - 24]), midi, loud, *ref,
            rng=key, n_timesteps=N_TIMESTEPS, method="inference",
        )
        return vocoder.apply(voc_params, mel)

    elapsed = _timeit(
        lambda i: full(params, voc_params, wav,
                       jax.random.fold_in(ks[9], i)), n=5)
    return elapsed / (n / SR)


def bench_flash_vs_xla():
    """Flash-Pallas vs XLA attention at the decode shapes (ref+src packed
    sequences, 4 heads x 512 head-dim — transformer.py config)."""
    from serenade_tpu.ops.attention import multi_head_attention

    out = {}
    for t in (1536, 3072, 6144):
        q = jax.random.normal(jax.random.key(9), (1, t, 2048), jnp.bfloat16)
        mask = jnp.ones((1, t))
        row = {}
        for backend in ("xla", "flash"):
            try:
                f = jax.jit(lambda q, m, bk=backend: multi_head_attention(
                    q, q, q, num_heads=4, key_mask=m, backend=bk))
                # feed the output back as the query: every dispatch is a
                # new operand AND the chain cannot be deduped or reordered
                state = {"q": q}

                def step(i, f=f, state=state):
                    state["q"] = f(state["q"], mask)
                    return state["q"]

                row[backend] = round(_timeit(step, n=20) * 1e3, 3)
            except Exception as e:  # pragma: no cover
                row[backend] = f"error: {type(e).__name__}"
        out[f"T{t}_ms"] = row
    return out


def bench_loader():
    """Steady-state input-pipeline throughput in batches/sec, measured on
    synthetic FULL-SIZE dumps through the real FeatsDataset + SSCCollater
    + ShardedBatchLoader path the train CLI builds (scaler normalization
    included).  Must comfortably exceed train steps/sec (~31 at b=16) or
    the HOST, not the chip, paces training — the number the train-step
    MFU measurement (synthetic device batches) cannot see."""
    import shutil
    import tempfile
    import time as _time

    import numpy as np

    from serenade_tpu.collaters.ssc import SSCCollater
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.datasets.loader import ShardedBatchLoader
    from serenade_tpu.utils.h5 import write_hdf5

    d = tempfile.mkdtemp(prefix="loaderbench")
    try:
        rng = np.random.default_rng(0)
        for i in range(48):
            t = int(rng.integers(600, 1200))
            path = f"{d}/utt{i}.h5"
            write_hdf5(path, "wave",
                       rng.standard_normal(t * 240).astype(np.float32))
            write_hdf5(path, "hubert",
                       rng.standard_normal((t, 768)).astype(np.float32))
            write_hdf5(path, "logmel",
                       rng.standard_normal((t, 80)).astype(np.float32))
            for k in ("loud", "est_lf0_score", "midi", "f0", "vuv"):
                write_hdf5(path, k,
                           rng.standard_normal((t, 1)).astype(np.float32))

        # module-level scaler classes (utils.scalers) so the dataset
        # pickles into spawn workers for the process-pool measurement
        from serenade_tpu.utils.scalers import MinMaxScaler, StandardScaler

        def z(dim):
            s = StandardScaler()
            s.mean_ = np.zeros(dim, np.float32)
            s.scale_ = np.ones(dim, np.float32)
            return s

        def mm():
            s = MinMaxScaler()
            s.data_min_ = np.zeros(1, np.float32)
            s.data_max_ = np.ones(1, np.float32)
            return s

        scaler = {"hubert": z(768), "logmel": z(80),
                  "score": mm(), "loud": mm()}
        train_keys = tuple(sorted(set(SSCCollater.FEATURE_KEYS.values())))

        def run(allow_cache, epochs, num_workers=0, worker_type="thread",
                host_dtype=None):
            ds = FeatsDataset(d, scaler=scaler, allow_cache=allow_cache,
                              load_keys=train_keys)
            loader = ShardedBatchLoader(ds, SSCCollater(host_dtype=host_dtype),
                                        batch_size=16,
                                        shuffle=True, process_index=0,
                                        process_count=1,
                                        num_workers=num_workers,
                                        worker_type=worker_type)
            if allow_cache:
                for _batch in loader:  # epoch 0 fills the cache
                    pass
            n, t0 = 0, None
            for _ in range(epochs):  # 3 batches/epoch
                for _batch in loader:
                    if t0 is None:
                        t0 = _time.perf_counter()  # first batch = warmup
                    else:
                        n += 1
            rate = n / (_time.perf_counter() - t0)
            loader.shutdown()
            return rate

        # the spawn-process pool only makes sense with real cores: on a
        # 1-2 core host the IPC + scheduling overhead measures ~6x SLOWER
        # (measured 2026-08-19 on the 1-core dev box: 0.6 vs 3.8 batches/s)
        ncpu = os.cpu_count() or 1
        if ncpu >= 4:
            nw = min(6, ncpu - 1)
            proc = run(False, 12, num_workers=nw, worker_type="process")
            proc_bf16 = run(False, 12, num_workers=nw,
                            worker_type="process", host_dtype="bfloat16")
        else:
            proc = proc_bf16 = None
        return (run(False, 12), run(True, 24), proc, proc_bf16,
                run(False, 12, host_dtype="bfloat16"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    from serenade_tpu.models import Serenade
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

    details = {}
    errors = {}

    # Host-contention guard (VERDICT r4 item 2): the 1-min load average
    # BEFORE this process does any work tells whether another job (e.g. a
    # concurrent training run) held the host during the measurement
    # window.  Host-side metrics (the loader bench) are meaningless on a
    # shared 1-core box — BENCH_r04's 9.7->2.7 "regression" was exactly
    # this — so they are recorded but excluded from regression checks.
    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    host_contended = load1 > 0.5 * ncpu

    # Tunnel-health guard (round 5): the axon tunnel intermittently
    # degrades 10-100x machine-wide for minutes-to-hours
    # (docs/CONTENTVEC_WEDGE.md — a warm 256x256 matmul round trip
    # measured 129 s during one such window).  Device timings taken in a
    # degraded window "regress" for reasons that are not code, so the
    # minimum round trip of a few trivial varied dispatches is recorded
    # with every bench, and when it sits far above the ~2.3 ms dispatch
    # floor the regression flagging is suppressed (deltas still land).
    xh = jnp.full((8, 128), 0.5, jnp.float32)
    float((xh @ xh.T)[0, 0])  # warm the program + backend
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(((xh + jnp.float32(i + 1)) @ xh.T)[0, 0])
        rtts.append(time.perf_counter() - t0)
    tunnel_rtt_ms = round(min(rtts) * 1e3, 2)
    tunnel_degraded = tunnel_rtt_ms > 25.0

    model = Serenade(dtype=jnp.bfloat16)
    vocoder = HiFiGANGenerator(dtype=jnp.bfloat16, resblock_backend="fused")
    init_batch_key = jax.random.split(jax.random.key(0), 10)
    init_batch = dict(
        x=jax.random.normal(init_batch_key[0], (1, SRC_FRAMES, 768)),
        lengths=jnp.array([SRC_FRAMES - 24]),
        logmel=jax.random.normal(init_batch_key[7], (1, SRC_FRAMES, 80)),
        midi=jax.random.uniform(init_batch_key[1], (1, SRC_FRAMES, 1)),
        loud=jax.random.uniform(init_batch_key[2], (1, SRC_FRAMES, 1)),
    )
    params = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.key(1)}, bt["x"], bt["lengths"],
            bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(2),
            deterministic=True,
        )
    )(init_batch)
    voc_params = jax.jit(
        lambda: vocoder.init(jax.random.key(7), jnp.zeros((1, 64, 80)))
    )()

    variance = {}

    (rtf, rtf_fast, rtf_distilled, rtf_int8, rtf_int8c,
     rtf_int8c_e2, rtf_std) = bench_conversion(
        model, vocoder, params, voc_params)
    details["conversion_rtf_ab2_7step"] = round(rtf_fast, 5)
    details["conversion_rtf_distilled_euler2"] = round(rtf_distilled, 5)
    details["conversion_rtf_int8_weights"] = round(rtf_int8, 5)
    details["conversion_rtf_int8_compute"] = round(rtf_int8c, 5)
    details["conversion_rtf_int8_compute_euler2"] = round(rtf_int8c_e2, 5)
    variance["ssc_conversion_rtf_1chip"] = round(rtf_std, 4)

    try:
        sps, mfu, flops, sps_std = bench_train(Serenade(dtype=jnp.bfloat16))
        details["train_steps_per_sec_b16_T512"] = round(sps, 3)
        variance["train_steps_per_sec_b16_T512"] = round(sps_std, 4)
        if mfu is not None:
            details["train_mfu"] = round(mfu, 4)
            variance["train_mfu"] = round(sps_std, 4)
        if flops is not None:
            details["train_step_tflops"] = round(flops / 1e12, 3)
    except Exception as e:
        errors["train"] = f"{type(e).__name__}: {e}"

    # MFU at the shape training actually runs (VERDICT r4 item 5):
    # T=1280 real-length bucket, with and without the device-resident
    # corpus gather in the loop (the trainer's production path)
    try:
        sps2, mfu2, flops2, std2 = bench_train(
            Serenade(dtype=jnp.bfloat16), t=1280, n_iters=15)
        details["train_steps_per_sec_b16_T1280"] = round(sps2, 3)
        variance["train_steps_per_sec_b16_T1280"] = round(std2, 4)
        if mfu2 is not None:
            details["train_mfu_T1280_b16"] = round(mfu2, 4)
            variance["train_mfu_T1280_b16"] = round(std2, 4)
        spsg, mfug, _, stdg = bench_train(
            Serenade(dtype=jnp.bfloat16), t=1280, gather=True,
            flops_hint=flops2, n_iters=15)
        details["train_steps_per_sec_b16_T1280_gather"] = round(spsg, 3)
        if mfug is not None:
            details["train_mfu_T1280_b16_gather"] = round(mfug, 4)
    except Exception as e:
        errors["train_T1280"] = f"{type(e).__name__}: {e}"

    try:
        cold, cached, proc, proc_bf16, cold_bf16 = bench_loader()
        details["loader_batches_per_sec"] = round(cold, 1)
        details["loader_batches_per_sec_cached"] = round(cached, 1)
        details["loader_batches_per_sec_bf16"] = round(cold_bf16, 1)
        if proc is not None:  # multi-core hosts only (>=4 cpus)
            details["loader_batches_per_sec_proc"] = round(proc, 1)
            details["loader_batches_per_sec_proc_bf16"] = round(proc_bf16, 1)
    except Exception as e:
        errors["loader"] = f"{type(e).__name__}: {e}"

    try:
        voc_rate, voc_std = bench_vocoder(vocoder, voc_params)
        details["vocoder_samples_per_sec"] = round(voc_rate)
        variance["vocoder_samples_per_sec"] = round(voc_std, 4)
    except Exception as e:
        errors["vocoder"] = f"{type(e).__name__}: {e}"

    try:
        solo_fps, grp_fps = bench_features()
        details["feature_frames_per_sec"] = round(solo_fps)
        details["feature_frames_per_sec_batch8"] = round(grp_fps)
    except Exception as e:
        errors["features"] = f"{type(e).__name__}: {e}"

    try:
        hv_rate, hv_std = bench_harvest()
        details["harvest_frames_per_sec"] = round(hv_rate)
        variance["harvest_frames_per_sec"] = round(hv_std, 4)
    except Exception as e:
        errors["harvest"] = f"{type(e).__name__}: {e}"

    try:
        details["batched_decode_audio_sec_per_sec"] = round(
            bench_batched_decode(model, params), 2)
    except Exception as e:
        errors["batched_decode"] = f"{type(e).__name__}: {e}"

    try:
        details["e2e_with_features_rtf"] = round(
            bench_e2e_with_features(model, vocoder, params, voc_params), 5)
    except Exception as e:
        errors["e2e_features"] = f"{type(e).__name__}: {e}"

    try:
        details["flash_vs_xla"] = bench_flash_vs_xla()
    except Exception as e:
        errors["flash_vs_xla"] = f"{type(e).__name__}: {e}"

    if errors:
        details["errors"] = errors

    details["host_load_1min_at_start"] = round(load1, 2)
    if host_contended:
        details["host_side_metrics_invalid"] = sorted(
            k for k in details if k.startswith("loader_"))
    details["tunnel_rtt_ms"] = tunnel_rtt_ms
    if tunnel_degraded:
        details["tunnel_degraded"] = True

    details["variance"] = variance
    try:
        vs_prev = _diff_vs_prev(details, variance,
                                "ssc_conversion_rtf_1chip", round(rtf, 5))
        if vs_prev is not None:
            details["vs_prev"] = vs_prev
    except Exception as e:  # diffing must never sink the bench itself
        details["vs_prev"] = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "ssc_conversion_rtf_1chip",
        "value": round(rtf, 5),
        "unit": "rtf (wall_sec / audio_sec; 10-step CFM + HiFiGAN, bf16)",
        "vs_baseline": round(RTF_TARGET / rtf, 3),
        "details": details,
    }))


if __name__ == "__main__":
    main()
