"""serenade-distill: distill a trained SSC checkpoint to 1-2 steps.

Beyond the reference (whose only sampler is the fixed 10-step Euler loop,
flow_matching.py:40-93): fine-tunes the CFM estimator of a TRAINED
checkpoint against its own ODE endpoints so decode reaches teacher
quality in 1-2 Euler steps — endpoint mode (default) backpropagates the
student's k-step rollout onto the teacher endpoint; reflow mode
straightens the field for any step count (`trainers/distill.py`;
quality quantified in tests/test_distill.py).  The distilled checkpoint
is a drop-in for `serenade-decode`/serving — the dumped config carries
``inference_n_timesteps`` which decode picks up as its default.

Typical invocation (after run.sh stage 3/7):

    serenade-distill \
        --teacher-checkpoint exp/<tag>/checkpoint-40000steps \
        --config exp/<tag>/config.yml \
        --train-dumpdir dump/train/norm --stats data/train/stats.joblib \
        --outdir exp/<tag>_distilled --distill-steps 2000
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from serenade_tpu.config import dump_config, load_config, resolve


def build_argparser():
    p = argparse.ArgumentParser(
        description="ReFlow-distill a trained SSC model to few-step sampling")
    p.add_argument("--teacher-checkpoint", required=True,
                   help="trained checkpoint (orbax dir) to distill")
    p.add_argument("--config", required=True,
                   help="teacher config.yml (beside the checkpoint)")
    p.add_argument("--train-dumpdir", required=True)
    p.add_argument("--stats", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--distill-steps", type=int, default=2000)
    p.add_argument("--teacher-steps", type=int, default=10,
                   help="teacher ODE steps per pair (reference sampler: 10)")
    p.add_argument("--mode", default="endpoint",
                   choices=("endpoint", "reflow"),
                   help="'endpoint' (default) regresses the student's own "
                        "k-step Euler rollout onto the teacher endpoint — "
                        "best quality at the FIXED --student-steps k "
                        "(measured ~0.1 dB over the teacher sampler at "
                        "k=2); 'reflow' straightens the field for ANY "
                        "step count (rectified flow) at somewhat lower "
                        "per-k quality — see tests/test_distill.py")
    p.add_argument("--solver", default="euler",
                   help="teacher ODE solver for pair generation")
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--student-steps", type=int, default=2,
                   help="deployed Euler step count: endpoint mode distills "
                        "exactly this rollout, and the dumped config makes "
                        "it decode's default n_timesteps")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="distillation fine-tune LR (teacher trained at 8e-4)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = teacher config's batch_size")
    p.add_argument("--data-axis", type=int, default=-1,
                   help="data-parallel axis size (-1 = all devices)")
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--verbose", type=int, default=1)
    return p


def main():
    args = build_argparser().parse_args()
    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    import jax
    import jax.numpy as jnp
    import joblib

    from serenade_tpu.checkpoint import restore_params_only
    from serenade_tpu.collaters import SSCCollater  # noqa: F401 (register)
    from serenade_tpu.datasets.loader import ShardedBatchLoader
    from serenade_tpu.parallel import make_mesh, shard_params
    from serenade_tpu.trainers import build_optimizer, create_train_state
    from serenade_tpu.trainers.distill import (
        build_distill_step,
        distill_config_overrides,
        distill_trainable_mask,
    )
    import serenade_tpu.models  # noqa: F401 (register models)
    import serenade_tpu.trainers.ssc  # noqa: F401 (register trainers)

    config = load_config(args.config)
    os.makedirs(args.outdir, exist_ok=True)
    np.random.seed(args.seed)

    scaler = joblib.load(args.stats)
    dataset_cls = resolve("dataset", config.get("dataset_type", "FeatsDataset"))
    collater_cls = resolve("collater", config.get("collater_type", "SSCCollater"))
    trainer_cls = resolve("trainer", config.get("trainer_type", "SSCTrainer"))
    model_cls = resolve("model", config.get("model_type", "Serenade"))

    dataset = dataset_cls(
        args.train_dumpdir, scaler=scaler,
        score_type=config.get("score_type", "est_lf0_score"),
        logmel_type=config.get("logmel_type", "logmel"),
        allow_cache=config.get("allow_cache", False),
    )
    batch_size = args.batch_size or int(config.get("batch_size", 4))
    mesh = make_mesh(data=args.data_axis, model=1)
    loader = ShardedBatchLoader(
        dataset, collater_cls(),
        batch_size=batch_size * mesh.shape["data"] // jax.process_count(),
        shuffle=True, seed=args.seed,
    )
    logging.info("distilling from %s over %d utterances (batch %d)",
                 args.teacher_checkpoint, len(dataset), batch_size)

    model = model_cls(**config.get("model_params", {}))
    teacher_params = shard_params(
        restore_params_only(args.teacher_checkpoint), mesh)

    distill_cfg = distill_config_overrides(config)
    distill_cfg.update({
        "train_max_steps": args.distill_steps,
        "optimizer_type": "AdamW",
        "optimizer_params": {"lr": args.lr,
                             **{k: v for k, v in config.get(
                                 "optimizer_params", {}).items()
                                if k != "lr"}},
        "scheduler_type": "ConstantLR",
        "scheduler_params": {},
        "inference_n_timesteps": args.student_steps,
        "distill_mode": args.mode,
        "distill_teacher_steps": args.teacher_steps,
        "distill_solver": args.solver,
        # distillation runs are short; keep artifacts coming
        "log_interval_steps": min(
            int(config.get("log_interval_steps", 500)),
            max(args.distill_steps // 10, 1)),
        "save_interval_steps": max(args.distill_steps // 2, 1),
        "eval_interval_steps": args.distill_steps + 1,  # no mel evals here
    })
    if jax.process_index() == 0:
        dump_config(distill_cfg, os.path.join(args.outdir, "config.yml"))

    trainable = distill_trainable_mask(teacher_params)
    tx, _ = build_optimizer(distill_cfg, trainable_mask=trainable)
    # the student starts AT the teacher but must not share buffers with it:
    # the jitted step donates the student params while the teacher stays
    # captured as program constants
    student_params = jax.tree_util.tree_map(jnp.copy, teacher_params)
    state = create_train_state(student_params, tx)

    def batch_adapter(batch):
        kwargs = {}
        if "f0_fluc" in batch:
            kwargs["extras"] = {"fluc": batch["f0_fluc"]}
        return (batch["x"], batch["lengths"], batch["logmel"],
                batch["midi"], batch["loud"]), kwargs

    step_fn = build_distill_step(
        model, teacher_params, tx,
        mode=args.mode, student_steps=args.student_steps,
        n_teacher_steps=args.teacher_steps, solver=args.solver,
        temperature=args.temperature, batch_to_model_args=batch_adapter,
    )

    trainer = trainer_cls(
        config=distill_cfg,
        train_step=step_fn,
        state=state,
        train_iter=loader,
        mesh=mesh,
        outdir=args.outdir,
        rng=jax.random.key(args.seed + 2),
    )
    trainer.run()
    logging.info(
        "distilled checkpoint in %s — decode with it directly; its config "
        "defaults n_timesteps to %d", args.outdir, args.student_steps)


if __name__ == "__main__":
    main()
