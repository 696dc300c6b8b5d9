#!/usr/bin/env python3
"""TPU training sanity run: full-size Serenade, synthetic data, N steps.

Verifies the real-hardware training path (bf16 UNet + GST + CFM under one
jitted step with donated state) learns — loss must drop — and reports
steps/sec + frames/sec for the round log.  Run: python scripts/tpu_train_sanity.py
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from serenade_tpu.models import Serenade
    from serenade_tpu.trainers import (
        build_optimizer, build_train_step, create_train_state,
    )

    model = Serenade(dtype=jnp.bfloat16)
    b, t = args.batch, args.frames
    ks = jax.random.split(jax.random.key(0), 6)

    # synthetic but learnable data: mel is a fixed linear map of the
    # content features plus noise, so the CFM objective has structure
    proj = jax.random.normal(ks[0], (768, 80)) * 0.1
    x = jax.random.normal(ks[1], (b, t, 768))
    logmel = jnp.tanh(x @ proj) + 0.05 * jax.random.normal(ks[2], (b, t, 80))
    batch = dict(
        x=x,
        lengths=jnp.full((b,), t, jnp.int32),
        logmel=logmel,
        midi=jax.random.uniform(ks[3], (b, t, 1)),
        loud=jax.random.uniform(ks[4], (b, t, 1)),
    )

    params = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.key(1)}, bt["x"], bt["lengths"],
            bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(2),
            deterministic=True,
        )
    )(batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M")

    config = {
        "optimizer_type": "AdamW",
        "optimizer_params": {"lr": 8e-4},
        "scheduler_type": "MultiStepLR",
        "scheduler_params": {"gamma": 0.5, "milestones": [100000]},
        "grad_norm": 1.0,
    }
    tx, _ = build_optimizer(config)
    state = create_train_state(params, tx)
    step_fn = build_train_step(model, tx)

    losses = []
    t_start = None
    for i in range(args.steps):
        state, metrics = step_fn(state, batch, jax.random.key(100 + i))
        if i == 0:
            metrics = jax.device_get(metrics)  # wait out the compile
            t_start = time.perf_counter()
        losses.append(float(jax.device_get(metrics)["train/loss"]))
        if i % 10 == 0:
            print(f"step {i:4d} loss {losses[-1]:.4f}")
    elapsed = time.perf_counter() - t_start
    sps = (args.steps - 1) / elapsed
    first, last = np.mean(losses[1:6]), np.mean(losses[-5:])
    print(f"steps/sec: {sps:.2f}  frames/sec: {sps * b * t:,.0f}")
    print(f"loss {first:.4f} -> {last:.4f} "
          f"({'OK decreasing' if last < first else 'NOT DECREASING'})")


if __name__ == "__main__":
    main()
