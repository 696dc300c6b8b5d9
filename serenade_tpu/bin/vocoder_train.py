"""serenade-vocoder-train: HiFiGAN vocoder GAN training on feature dumps.

New capability relative to the reference (which consumes an externally
pretrained vocoder): trains the implemented HiFiGAN generator against the
MSD+MPD discriminator family on the `wave`/`logmel` pairs the standard
preprocessing stage already dumps.

Config keys: generator_params / discriminator periods-scales defaults,
vocoder_batch_size, segment_frames, lambda_{adv,fm,mel}, lr's, intervals.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description="train HiFiGAN vocoder")
    p.add_argument("--train-dumpdir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--resume", default="")
    p.add_argument("--verbose", type=int, default=1)
    args = p.parse_args()
    logging.basicConfig(
        level=logging.INFO if args.verbose > 0 else logging.WARN,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s",
    )

    import jax
    import optax

    from serenade_tpu.checkpoint import (
        find_latest_checkpoint, restore_checkpoint, save_checkpoint,
    )
    from serenade_tpu.config import load_config
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.trainers.vocoder_trainer import (
        VocoderTrainState,
        build_vocoder_train_step,
        create_vocoder_state,
        sample_mel_wav_segments,
    )
    from serenade_tpu.vocoder.hifigan import (
        HiFiGANGenerator, MultiScaleMultiPeriodDiscriminator,
    )

    config = load_config(args.config)
    os.makedirs(args.outdir, exist_ok=True)

    gp = dict(config.get("generator_params", {}))
    generator = HiFiGANGenerator(
        in_channels=gp.get("in_channels", config.get("num_mels", 80)),
        channels=gp.get("channels", 512),
        upsample_scales=tuple(gp.get("upsample_scales", (8, 6, 5))),
        upsample_kernel_sizes=tuple(
            gp.get("upsample_kernel_sizes", (16, 12, 10))),
    )
    total_up = int(np.prod(generator.upsample_scales))
    hop = int(config.get("hop_size", 240))
    if total_up != hop:
        raise SystemExit(
            f"generator upsample product {total_up} must equal hop {hop}"
        )
    discriminator = MultiScaleMultiPeriodDiscriminator()

    dataset = FeatsDataset(args.train_dumpdir, scaler=None)
    items = [dataset[i] for i in range(len(dataset))]
    logging.info("loaded %d utterances", len(items))

    seg_frames = int(config.get("segment_frames", 32))
    batch = int(config.get("vocoder_batch_size", 8))
    rng_np = np.random.default_rng(int(config.get("seed", 0)))
    first = sample_mel_wav_segments(items, rng_np, batch, seg_frames, hop)

    import jax.numpy as jnp

    gen_params = jax.jit(
        lambda m: generator.init(jax.random.key(0), m)
    )(jnp.asarray(first["mel"]))
    disc_params = jax.jit(
        lambda w: discriminator.init(jax.random.key(1), w)
    )(jnp.asarray(first["wav"]))

    gen_tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(float(config.get("gen_lr", 2e-4)), b1=0.8, b2=0.99),
    )
    disc_tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(float(config.get("disc_lr", 2e-4)), b1=0.8, b2=0.99),
    )
    state = create_vocoder_state(gen_params, disc_params, gen_tx, disc_tx)
    step_fn = build_vocoder_train_step(
        generator, discriminator, gen_tx, disc_tx,
        sampling_rate=int(config.get("sampling_rate", 24000)),
        lambda_adv=float(config.get("lambda_adv", 1.0)),
        lambda_fm=float(config.get("lambda_fm", 2.0)),
        lambda_mel=float(config.get("lambda_mel", 45.0)),
    )

    start_step = 0
    if args.resume:
        path = (args.resume if args.resume != "latest"
                else find_latest_checkpoint(args.outdir))
        if path:
            restored = restore_checkpoint(path)
            state = VocoderTrainState(
                gen_params=restored["params"]["generator"],
                gen_opt=state.gen_opt,
                disc_params=restored["params"]["discriminator"],
                disc_opt=state.disc_opt,
                step=jnp.asarray(int(restored["meta"]["step"]), jnp.int32),
            )
            start_step = int(restored["meta"]["step"])
            logging.info("resumed from %s", path)

    max_steps = int(config.get("vocoder_train_max_steps", 50000))
    log_every = int(config.get("log_interval_steps", 100))
    save_every = int(config.get("save_interval_steps", 5000))
    key = jax.random.key(int(config.get("seed", 0)))
    for step in range(start_step, max_steps):
        batch_np = sample_mel_wav_segments(items, rng_np, batch, seg_frames,
                                           hop)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, jax.device_put(batch_np), sub)
        if (step + 1) % log_every == 0:
            m = jax.device_get(metrics)
            logging.info(
                "step %d gen %.4f disc %.4f mel %.4f", step + 1,
                float(m["train/gen_loss"]), float(m["train/disc_loss"]),
                float(m["train/mel_loss"]),
            )
        if (step + 1) % save_every == 0 or step + 1 == max_steps:
            save_checkpoint(
                args.outdir, step + 1,
                {"generator": jax.device_get(state.gen_params),
                 "discriminator": jax.device_get(state.disc_params)},
            )
    logging.info("vocoder training finished at %d steps", max_steps)


if __name__ == "__main__":
    main()
