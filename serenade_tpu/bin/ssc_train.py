"""serenade-train: SSC model training CLI.

Counterpart of reference bin/ssc_train.py:97-414.  Same config surface
(YAML merged with argv, re-dumped with a version stamp; string-keyed
model/trainer/collater/optimizer/scheduler factories; init-checkpoint vs
resume; module freezing) mapped onto the TPU runtime: a ('data','model')
mesh instead of DDP/NCCL, jitted train step with donated state, Orbax
checkpoints, per-host sharded input pipeline.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import numpy as np

from serenade_tpu.config import dump_config, load_config, resolve

DEFAULT_DATASET = "FeatsDataset"
DEFAULT_VARIANT_SUFFIX = ""


def build_argparser():
    p = argparse.ArgumentParser(description="train SSC model")
    p.add_argument("--train-dumpdir", required=True)
    p.add_argument("--dev-dumpdir", required=True)
    p.add_argument("--stats", required=True, help="stats.joblib from compute_stats")
    p.add_argument("--outdir", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--resume", default="", nargs="?")
    p.add_argument("--init-checkpoint", "--pretrain", default="", nargs="?",
                   help="checkpoint to load params from (no optimizer state)")
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--model-axis", type=int, default=1,
                   help="tensor-parallel axis size of the device mesh")
    p.add_argument("--data-axis", type=int, default=-1,
                   help="data-parallel axis size (-1 = all remaining devices)")
    p.add_argument("--zero1", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="shard optimizer state over the data axis (ZeRO-1); "
                        "config key 'zero1' sets the default, --no-zero1 "
                        "overrides it off")
    p.add_argument("--verbose", type=int, default=1)
    return p


def count_parameter_table(params) -> str:
    """Per-module parameter counts (reference ssc_train.py:53-84 tables)."""
    import jax

    rows = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        top = str(getattr(path[1] if len(path) > 1 else path[0], "key", "?"))
        rows[top] = rows.get(top, 0) + int(np.prod(leaf.shape))
    total = sum(rows.values())
    lines = [f"{'module':<28}{'params':>14}"]
    for k in sorted(rows):
        lines.append(f"{k:<28}{rows[k]:>14,}")
    lines.append(f"{'TOTAL':<28}{total:>14,}")
    return "\n".join(lines)


def main(dataset_name: str = DEFAULT_DATASET):
    args = build_argparser().parse_args()
    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    import jax
    import jax.numpy as jnp
    import joblib

    from serenade_tpu.collaters import SSCCollater  # noqa: F401 (register)
    from serenade_tpu.datasets.loader import ShardedBatchLoader
    from serenade_tpu.parallel import make_mesh, shard_params
    from serenade_tpu.parallel.mesh import maybe_init_distributed
    from serenade_tpu.trainers import (
        SSCTrainer, build_optimizer, build_train_step, create_train_state,
    )
    from serenade_tpu.trainers.eval_samples import make_eval_fn
    from serenade_tpu.utils.model_io import freeze_mask, transfer_params
    import serenade_tpu.models  # noqa: F401 (register models)
    import serenade_tpu.trainers.ssc  # noqa: F401 (register trainers)

    maybe_init_distributed()
    config = load_config(args.config)
    config.update({k: v for k, v in vars(args).items() if v not in (None, "")})
    os.makedirs(args.outdir, exist_ok=True)
    if jax.process_index() == 0:
        dump_config(config, os.path.join(args.outdir, "config.yml"))

    np.random.seed(args.seed)

    scaler = joblib.load(args.stats)
    dataset_cls = resolve("dataset", config.get("dataset_type", dataset_name))
    collater_cls = resolve("collater", config.get("collater_type", "SSCCollater"))
    trainer_cls = resolve("trainer", config.get("trainer_type", "SSCTrainer"))
    model_cls = resolve("model", config.get("model_type", "Serenade"))

    # the train collater consumes only these streams — skipping the rest
    # (wave is ~1 MB/item) measurably raises loader throughput
    # (bench.py::bench_loader); the collater declares its needs
    train_keys = tuple(sorted(set(collater_cls.FEATURE_KEYS.values())))
    train_dataset = dataset_cls(
        args.train_dumpdir, scaler=scaler,
        score_type=config.get("score_type", "est_lf0_score"),
        logmel_type=config.get("logmel_type", "logmel"),
        allow_cache=config.get("allow_cache", False),
        load_keys=train_keys,
    )
    dev_dataset = dataset_cls(
        args.dev_dumpdir, scaler=scaler,
        score_type=config.get("score_type", "est_lf0_score"),
        logmel_type=config.get("logmel_type", "logmel"),
        logmel_fallback=True,  # original dev dumps carry no cyclic key
    )
    # host_batch_dtype: "bfloat16" halves collate + host->device bytes on
    # the training batches (model matmuls run bf16 anyway); dev/eval keeps
    # the f32 default so eval reconstructions are full precision.
    # collater_params passes through (e.g. pad_batch_to: 1280 pins EVERY
    # batch to one length -> ONE compiled train program instead of one
    # per 64-frame bucket; decisive on slow-compile tunneled links where
    # each big-program compile costs minutes)
    collater_kwargs = dict(config.get("collater_params") or {})
    if config.get("host_batch_dtype"):
        collater_kwargs["host_dtype"] = config["host_batch_dtype"]
    collater = collater_cls(**collater_kwargs)
    batch_size = int(config.get("batch_size", 4))
    mesh = make_mesh(data=args.data_axis, model=args.model_axis)
    global_batch = batch_size * mesh.shape["data"]
    train_loader = ShardedBatchLoader(
        train_dataset, collater, batch_size=global_batch // jax.process_count(),
        shuffle=True, seed=args.seed,
        # reference conf/serenade.yaml:54 num_workers; here a spawn-process
        # pool is the GIL-free option (loader_worker_type: process)
        num_workers=int(config.get("num_workers", 0)),
        worker_type=config.get("loader_worker_type", "thread"),
        # sort_window: length-sort inside windows of N batches so same-batch
        # items have similar lengths — cuts bucket-padding FLOP (items are
        # still globally shuffled across windows each epoch)
        sort_window=int(config.get("sort_window", 0)),
    )
    dev_loader = ShardedBatchLoader(
        dev_dataset, collater_cls(),  # dev/eval stays f32 regardless
        batch_size=min(global_batch, len(dev_dataset)),
        shuffle=False, drop_last=False, process_index=0, process_count=1,
    )
    logging.info("dataset: %d train / %d dev; global batch %d; mesh %s",
                 len(train_dataset), len(dev_dataset), global_batch,
                 dict(mesh.shape))

    model = model_cls(**config.get("model_params", {}))
    first_batch = next(iter(dev_loader))
    rename = trainer_cls.BATCH_RENAME
    init_args = {rename.get(k, k): jnp.asarray(v)
                 for k, v in first_batch.items()}

    def init_model(init_args):
        kwargs = {}
        if "f0_fluc" in init_args:
            kwargs["f0_fluc"] = init_args["f0_fluc"]
        return model.init(
            {"params": jax.random.key(args.seed)},
            init_args["x"], init_args["lengths"], init_args["logmel"],
            init_args["midi"], init_args["loud"],
            rng=jax.random.key(args.seed + 1), deterministic=True, **kwargs,
        )

    params = jax.jit(init_model)(init_args)
    logging.info("\n%s", count_parameter_table(params))

    # partial-transfer / freezing (reference ssc_train.py:387-401)
    if args.init_checkpoint:
        from serenade_tpu.checkpoint import restore_params_only

        src = restore_params_only(args.init_checkpoint)
        modules = config.get("load-mods") or config.get("load_mods")
        if modules:
            params = transfer_params(params, src, modules)
        else:
            params = src
        logging.info("initialized params from %s", args.init_checkpoint)

    trainable = None
    freeze = config.get("freeze-mods") or config.get("freeze_mods")
    if freeze:
        trainable = freeze_mask(params, freeze)
        logging.info("froze modules: %s", freeze)

    tx, _ = build_optimizer(config, trainable_mask=trainable)
    params = shard_params(params, mesh)
    state = create_train_state(params, tx)
    zero1 = (args.zero1 if args.zero1 is not None
             else bool(config.get("zero1", False)))
    opt_shardings = None
    if zero1 and mesh.shape["data"] > 1:
        from serenade_tpu.parallel.sharding import (
            infer_opt_state_shardings, shard_opt_state,
        )

        opt_shardings = infer_opt_state_shardings(state.opt_state, mesh)
        state = dataclasses.replace(
            state, opt_state=shard_opt_state(state.opt_state, mesh))
        logging.info("ZeRO-1: optimizer state sharded over data axis "
                     "(%d-way)", mesh.shape["data"])
    step_fn = build_train_step(
        model, tx,
        prior_loss_start_steps=int(config.get("prior_loss_start_steps", 0)),
        batch_to_model_args=_batch_adapter(config),
        opt_state_shardings=opt_shardings,
    )

    # device_resident_data: stack the whole train corpus into HBM once
    # and gather batches on device by index — removes the per-step
    # host->device batch upload (the bottleneck on tunneled/WAN-attached
    # chips; see datasets/device_cache.py).  Requires the fixed-length
    # collater contract (collater_params.pad_frames_to).
    train_iter = train_loader
    if config.get("device_resident_data"):
        from serenade_tpu.datasets.device_cache import DeviceResidentData

        pft = int((config.get("collater_params") or {}).get(
            "pad_frames_to") or 0)
        if not pft:
            raise ValueError("device_resident_data requires "
                             "collater_params.pad_frames_to")
        dr = DeviceResidentData(train_dataset, pad_frames_to=pft,
                                batch_size=global_batch, seed=args.seed,
                                mesh=mesh)
        train_iter = dr
        step_fn = dr.wrap_step(step_fn)
        train_loader.shutdown()
        logging.info("device-resident training data: per-step upload is "
                     "an index vector")

    vocoder = _maybe_vocoder(config, scaler)
    eval_fn = make_eval_fn(
        model, first_batch, outdir=args.outdir,
        vocoder=vocoder,
        num_save=int(config.get("num_save_intermediate_results", 8)),
        batch_rename=rename,
    )

    trainer = trainer_cls(
        config=config,
        train_step=step_fn,
        state=state,
        train_iter=train_iter,
        dev_iter=dev_loader,
        mesh=mesh,
        outdir=args.outdir,
        eval_fn=eval_fn,
        rng=jax.random.key(args.seed + 2),
    )
    if args.resume:
        trainer.resume(args.resume if args.resume != "latest" else None)
    try:
        trainer.run()
    finally:
        # release spawned loader workers promptly instead of holding their
        # RAM through the post-training save/eval tail until atexit
        train_loader.shutdown()
        dev_loader.shutdown()


def _batch_adapter(config):
    def adapter(batch):
        args = (batch["x"], batch["lengths"], batch["logmel"], batch["midi"],
                batch["loud"])
        kwargs = {}
        if "f0_fluc" in batch:
            kwargs["f0_fluc"] = batch["f0_fluc"]
        return args, kwargs

    return adapter


def _maybe_vocoder(config, scaler):
    voc_cfg = config.get("vocoder") or {}
    from serenade_tpu.vocoder.vocoder import vocoder_available

    if not vocoder_available(voc_cfg):
        logging.info("no vocoder checkpoint; eval samples will be mel-only")
        return None
    ckpt = voc_cfg.get("checkpoint") or ""
    from serenade_tpu.vocoder import Vocoder

    trg_stats = {
        "mean": scaler["logmel"].mean_,
        "scale": scaler["logmel"].scale_,
    }
    return Vocoder(ckpt, voc_cfg["config"], voc_cfg["stats"],
                   trg_stats=trg_stats)


if __name__ == "__main__":
    main()
