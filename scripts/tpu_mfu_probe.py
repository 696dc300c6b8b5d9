#!/usr/bin/env python3
"""Train-step MFU attack (VERDICT r3 item 4): profile split + the
fused-QKV lever, measured at the real training shape.

Produces, on one real chip:
  1. A component split of the b=16 train step — forward, backward
     (fwd+grad minus fwd), optimizer tail (full step minus fwd+grad) —
     at T=512 (the bench shape) and T=1024 (the real-length regime).
  2. A micro-bench of the fused-QKV hypothesis: 3 separate
     (B*T, C) @ (C, 3C_inner) projections vs one concatenated
     (C, 3*C_inner) matmul at the UNet attention geometry.
  3. A roofline summary: measured step time vs the bf16-FLOP floor and
     the HBM-traffic floor, so "0.42 MFU is/isn't the XLA ceiling at
     this geometry" has a number behind it (docs/PROFILING.md).

Timing uses the varied-operand + scalar-fetch-barrier methodology
(bench.py::_timeit; the axon tunnel dedupes identical dispatches).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e bf16 peak (see bench.py _PEAK_BF16)
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_GBPS = 820e9


def _barrier(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf[(0,) * leaf.ndim]).astype(jnp.float32))


def timeit(fn, n=30, warmup=3):
    for r in range(warmup):
        _barrier(fn(9_000 + r))
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(i)
    _barrier(out)
    return (time.perf_counter() - t0) / n


def component_split(t_frames: int, b: int = 16):
    from __graft_entry__ import _example_batch, _full_model
    from serenade_tpu.trainers import (
        build_optimizer, build_train_step, create_train_state,
    )

    model = _full_model()
    batch = _example_batch(jax.random.key(0), b, t_frames)
    params = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.key(1)}, bt["x"], bt["lengths"],
            bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(2),
            deterministic=True,
        )
    )(batch)
    config = {
        "optimizer_type": "AdamW",
        "optimizer_params": {"lr": 8e-4, "mu_dtype": "bfloat16"},
        "scheduler_type": "MultiStepLR",
        "scheduler_params": {"gamma": 0.5, "milestones": [100000]},
        "grad_norm": 1.0,
    }
    tx, _ = build_optimizer(config)
    state = create_train_state(params, tx)
    step_fn = build_train_step(model, tx, donate=False)

    def loss_fn(p, bt, rng):
        out = model.apply(p, bt["x"], bt["lengths"], bt["logmel"],
                          bt["midi"], bt["loud"], rng=rng,
                          deterministic=False,
                          rngs={"dropout": jax.random.fold_in(rng, 1)})
        return out["cfm_loss"] + out["prior_loss"]

    fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(lambda p, bt, rng: jax.value_and_grad(loss_fn)(
        p, bt, rng)[0])

    try:
        flops = (
            jax.jit(lambda s, bt, k: step_fn(s, bt, k))
            .lower(state, batch, jax.random.key(3))
            .compile().cost_analysis()["flops"]
        )
    except Exception:
        flops = None

    def vary(bt, i):
        return dict(bt, x=bt["x"] + jnp.float32(i) * 1e-6)

    t_f = timeit(lambda i: fwd(params, vary(batch, i),
                               jax.random.fold_in(jax.random.key(5), i)))
    t_fb = timeit(lambda i: fwd_bwd(params, vary(batch, i),
                                    jax.random.fold_in(jax.random.key(6), i)))
    t_step = timeit(lambda i: step_fn(state, vary(batch, i),
                                      jax.random.fold_in(jax.random.key(7), i))[1])

    n_params = sum(l.size for l in jax.tree_util.tree_leaves(params))
    res = {
        "T": t_frames, "b": b,
        "fwd_ms": round(1e3 * t_f, 3),
        "bwd_ms": round(1e3 * (t_fb - t_f), 3),
        "opt_tail_ms": round(1e3 * (t_step - t_fb), 3),
        "step_ms": round(1e3 * t_step, 3),
        "steps_per_sec": round(1.0 / t_step, 2),
    }
    if flops:
        res["step_tflops"] = round(flops / 1e12, 3)
        res["mfu"] = round(flops / t_step / PEAK_BF16, 4)
        res["flop_floor_ms"] = round(1e3 * flops / PEAK_BF16, 3)
    # HBM floor: weights fwd+bwd (2 reads) + grads (1 write 1 read) +
    # optimizer (params rw, mu bf16 rw, nu f32 rw, grads read) in bytes
    wb = n_params * 2  # bf16 weights
    opt_bytes = n_params * (4 + 4 + 2 + 2 + 4 + 4 + 4)  # p rw, mu rw, nu rw, g r
    res["n_params_m"] = round(n_params / 1e6, 1)
    res["opt_hbm_floor_ms"] = round(1e3 * opt_bytes / HBM_GBPS, 3)
    res["weight_hbm_fwd_bwd_ms"] = round(1e3 * 3 * wb / HBM_GBPS, 3)
    return res


def fused_qkv_micro(b: int = 16, t: int = 512, c: int = 512,
                    inner: int = 2048):
    """3 separate QKV projections vs one fused (C, 3*inner) matmul at the
    UNet attention geometry, bf16."""
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (b * t, c), jnp.bfloat16)
    ws = [jax.random.normal(ks[i + 1], (c, inner), jnp.bfloat16)
          / np.sqrt(c) for i in range(3)]
    w_fused = jnp.concatenate(ws, axis=1)

    @jax.jit
    def separate(x, w1, w2, w3):
        return x @ w1, x @ w2, x @ w3

    @jax.jit
    def fused(x, w):
        y = x @ w
        return y[:, :inner], y[:, inner:2 * inner], y[:, 2 * inner:]

    t_sep = timeit(lambda i: separate(x + jnp.bfloat16(i * 1e-3), *ws))
    t_fus = timeit(lambda i: fused(x + jnp.bfloat16(i * 1e-3), w_fused))
    flops = 2 * b * t * c * 3 * inner
    return {
        "shape": f"({b*t},{c})x({c},{3*inner})",
        "separate_ms": round(1e3 * t_sep, 4),
        "fused_ms": round(1e3 * t_fus, 4),
        "speedup": round(t_sep / t_fus, 3),
        "sep_tflops": round(flops / t_sep / 1e12, 1),
        "fused_tflops": round(flops / t_fus / 1e12, 1),
    }


def int8_matmul_micro(m: int = 8192, k: int = 512, n: int = 2048):
    """bf16 vs int8xint8 matmul at the attention projection geometry —
    the MXU int8-mode headroom behind quantize.int8_dot."""
    ks = jax.random.split(jax.random.key(1), 2)
    xb = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    wb = jax.random.normal(ks[1], (k, n), jnp.bfloat16)
    xi = jnp.clip(jnp.round(xb.astype(jnp.float32) * 10), -127, 127
                  ).astype(jnp.int8)
    wi = jnp.clip(jnp.round(wb.astype(jnp.float32) * 10), -127, 127
                  ).astype(jnp.int8)

    f_b = jax.jit(lambda a, w: a @ w)
    f_i = jax.jit(lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    t_b = timeit(lambda i: f_b(xb + jnp.bfloat16(i * 1e-3), wb))
    t_i = timeit(lambda i: f_i(xi + jnp.int8(i % 3), wi))
    flops = 2 * m * k * n
    return {
        "shape": f"({m},{k})x({k},{n})",
        "bf16_ms": round(1e3 * t_b, 4),
        "int8_ms": round(1e3 * t_i, 4),
        "bf16_tflops": round(flops / t_b / 1e12, 1),
        "int8_tops": round(flops / t_i / 1e12, 1),
    }


def main():
    out = {"device": str(jax.devices()[0])}
    out["qkv_micro"] = fused_qkv_micro()
    out["int8_micro"] = int8_matmul_micro()
    out["split_T512"] = component_split(512)
    out["split_T1024"] = component_split(1024)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
