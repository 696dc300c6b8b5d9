"""End-of-round benchmark: single-utterance SSC conversion RTF on one chip.

Measures the full hot path of `serenade-decode` (reference
ssc_decode.py:428-455): content encoding + GST + 10-step Euler CFM over the
packed reference+source sequence + HiFiGAN vocoding to the waveform, on the
flagship full-size model in bfloat16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
SRC_FRAMES = 1024        # ~10.2 s source utterance
REF_FRAMES = 512         # ~5.1 s style reference
N_TIMESTEPS = 10         # reference flow_matching.py:40
RTF_TARGET = 0.05        # BASELINE.md north star


def main():
    from serenade_tpu.models import Serenade
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

    model = Serenade(dtype=jnp.bfloat16)
    vocoder = HiFiGANGenerator(dtype=jnp.bfloat16)
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

    init_batch = dict(
        x=src["x"], lengths=src["lengths"],
        logmel=jax.random.normal(ks[7], (b, ts, 80)),
        midi=src["midi"], loud=src["loud"],
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

    # two programs (CFM sampler / vocoder) compile faster than one giant
    # fused graph and are each cached persistently
    @jax.jit
    def convert(params, src, ref, key):
        return model.apply(
            params, src["x"], src["lengths"], src["midi"], src["loud"],
            ref["ref_x"], ref["ref_lengths"], ref["ref_logmel"],
            ref["ref_midi"], ref["ref_loud"], rng=key,
            n_timesteps=N_TIMESTEPS, method="inference",
        )

    vocode = jax.jit(lambda vp, mel: vocoder.apply(vp, mel))

    # warmup/compile
    vocode(voc_params, convert(params, src, ref, ks[8])).block_until_ready()

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        wav = vocode(voc_params,
                     convert(params, src, ref, jax.random.fold_in(ks[9], i)))
    wav.block_until_ready()
    elapsed = (time.perf_counter() - t0) / n_iters

    audio_seconds = int(src["lengths"][0]) * FRAME_MS / 1000.0
    rtf = elapsed / audio_seconds
    print(json.dumps({
        "metric": "ssc_conversion_rtf_1chip",
        "value": round(rtf, 5),
        "unit": "rtf (wall_sec / audio_sec; 10-step CFM + HiFiGAN, bf16)",
        "vs_baseline": round(RTF_TARGET / rtf, 3),
    }))


if __name__ == "__main__":
    main()
