"""serenade-vocoder-train: vocoder GAN training on feature dumps.

New capability relative to the reference (which consumes externally
pretrained vocoders): trains either vocoder family in-framework —

* ``--vocoder-type hifigan`` (default): mel-conditioned HiFiGAN on the
  `wave`/`logmel` pairs the standard preprocessing stage dumps, against
  the HiFiGAN MSD+MPD adversary.
* ``--vocoder-type sifigan``: the source-filter generator on
  WORLD-analyzed conditioning (mcep+bap aux features, sine excitation,
  dense dilation factors — the same streams stage-9 postprocessing
  feeds, so the trained generator is drop-in for it), against the
  UnivNet MR-spectral + MPD adversary with the source-regularization
  residual loss — the reference SiFiGAN recipe's exact training setup
  (ref bin/sifigan_config/train.yaml:6-7, train/sifigan.yaml:12,27-41).

``--discriminator-type``/``discriminator_type`` overrides the adversary.
Config keys: generator_params / discriminator periods-scales defaults,
vocoder_batch_size, segment_frames, lambda_{adv,fm,mel,reg}, lr's,
intervals.
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
    p.add_argument("--vocoder-type", choices=("hifigan", "sifigan"),
                   default="hifigan")
    p.add_argument("--discriminator-type",
                   choices=("msd_mpd", "univnet"), default=None,
                   help="adversary family; default follows the reference "
                        "recipe (univnet for sifigan — ref sifigan_config/"
                        "train.yaml:6 — msd_mpd for hifigan).  Config key "
                        "discriminator_type overrides the default too")
    p.add_argument("--sifigan-feats-dir", default=None,
                   help="precomputed SiFiGAN streams from "
                        "serenade-sifigan-extract-features; skips the "
                        "startup WORLD analysis of --train-dumpdir")
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
        AsyncSaver, find_latest_checkpoint, restore_checkpoint,
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
    sr = int(config.get("sampling_rate", 24000))
    if args.vocoder_type == "sifigan":
        from serenade_tpu.sifigan import SiFiGANGenerator
        from serenade_tpu.trainers.vocoder_trainer import (
            prepare_sifigan_utterance, sample_sifigan_segments,
            sifigan_forward,
        )

        up = tuple(gp.get("upsample_scales", (5, 4, 3, 2)))
        hop = int(np.prod(up))  # sifigan frames at its own rate (5 ms)
        analysis_hop = int(sr * float(config.get("sifigan_shiftms", 5.0))
                           / 1000.0)
        if analysis_hop != hop:
            raise SystemExit(
                f"upsample product {hop} must equal the analysis hop "
                f"{analysis_hop} (sampling_rate * sifigan_shiftms / 1000)"
            )
        mcep_dim = int(config.get("mcep_dim", 39))
        generator = SiFiGANGenerator(
            in_channels=gp.get("in_channels", mcep_dim + 1 + 3),
            channels=gp.get("channels", 512),
            upsample_scales=up,
            upsample_kernel_sizes=tuple(
                gp.get("upsample_kernel_sizes", tuple(2 * u for u in up))),
        )
    else:
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
    disc_type = (args.discriminator_type
                 or config.get("discriminator_type")
                 or ("univnet" if args.vocoder_type == "sifigan"
                     else "msd_mpd"))
    if disc_type == "univnet":
        from serenade_tpu.vocoder.univnet import (
            UnivNetMultiResolutionMultiPeriodDiscriminator,
        )

        discriminator = UnivNetMultiResolutionMultiPeriodDiscriminator()
    else:
        discriminator = MultiScaleMultiPeriodDiscriminator()
    logging.info("discriminator: %s", disc_type)

    dataset = FeatsDataset(args.train_dumpdir, scaler=None)
    seg_frames = int(config.get("segment_frames", 32))
    batch = int(config.get("vocoder_batch_size", 8))
    rng_np = np.random.default_rng(int(config.get("seed", 0)))

    if args.vocoder_type == "sifigan":
        if args.sifigan_feats_dir:
            from serenade_tpu.bin.sifigan_extract_features import (
                load_precomputed,
            )

            items = [it for it in load_precomputed(args.sifigan_feats_dir)
                     if it["c"].shape[0] > seg_frames]
            logging.info("loaded %d precomputed sifigan utterances from %s",
                         len(items), args.sifigan_feats_dir)
        else:
            items = []
            for i in range(len(dataset)):
                prepared = prepare_sifigan_utterance(
                    dataset[i]["wave"], sr,
                    frame_period_ms=float(
                        config.get("sifigan_shiftms", 5.0)),
                    mcep_dim=int(config.get("mcep_dim", 39)),
                    dense_factors=tuple(
                        config.get("dense_factors", (0.5, 1, 4, 8))),
                    upsample_scales=generator.upsample_scales,
                )
                if (prepared is not None
                        and prepared["c"].shape[0] > seg_frames):
                    items.append(prepared)
        if not items:
            raise SystemExit("no usable (voiced, long enough) utterances")

        def sampler():
            return sample_sifigan_segments(
                items, rng_np, batch, seg_frames, hop,
                upsample_scales=generator.upsample_scales)

        # source regularization (reference train/sifigan.yaml:12,27-41:
        # lambda_reg 1.0): the excitation output must match the natural
        # waveform's CheapTrick-envelope-removed residual
        lambda_reg = float(config.get("lambda_reg", 1.0))
        if lambda_reg > 0:
            from serenade_tpu.vocoder.losses import residual_loss

            gen_fwd = sifigan_forward(generator, with_excitation=True)

            def reg_loss_fn(aux, batch_):
                return residual_loss(aux, batch_["wav"], batch_["cf0"],
                                     sampling_rate=sr, hop_size=hop)
        else:
            gen_fwd = sifigan_forward(generator)
            reg_loss_fn = None
    else:
        items = [dataset[i] for i in range(len(dataset))]

        def sampler():
            return sample_mel_wav_segments(items, rng_np, batch, seg_frames,
                                           hop)

        gen_fwd = None
        reg_loss_fn = None
        lambda_reg = 0.0
    logging.info("loaded %d utterances", len(items))
    first = sampler()

    import jax.numpy as jnp

    if args.vocoder_type == "sifigan":
        gen_params = jax.jit(
            lambda s, c, d: generator.init(jax.random.key(0), s, c, list(d))
        )(jnp.asarray(first["sine"]), jnp.asarray(first["c"]),
          tuple(jnp.asarray(x) for x in first["dfs"]))
    else:
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
        sampling_rate=sr,
        lambda_adv=float(config.get("lambda_adv", 1.0)),
        lambda_fm=float(config.get("lambda_fm", 2.0)),
        lambda_mel=float(config.get("lambda_mel", 45.0)),
        lambda_reg=lambda_reg,
        gen_forward=gen_fwd,
        reg_loss_fn=reg_loss_fn,
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
    if args.vocoder_type == "hifigan":
        # identity vocoder stats beside the checkpoints: training consumed
        # RAW logmel, so the Vocoder wrapper's renormalization must be a
        # no-op — point the `vocoder:` config block's `stats` here
        from serenade_tpu.utils.h5 import write_hdf5

        stats_path = os.path.join(args.outdir, "stats.h5")
        n_mels = int(generator.in_channels)
        write_hdf5(stats_path, "mean", np.zeros(n_mels, np.float32))
        write_hdf5(stats_path, "scale", np.ones(n_mels, np.float32))
        import yaml as _yaml

        with open(os.path.join(args.outdir, "config.yml"), "w") as f:
            _yaml.safe_dump(dict(config), f)
        logging.info("wrote identity stats.h5 + config.yml beside the "
                     "checkpoints (vocoder: block can point at %s)",
                     args.outdir)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(args.outdir)
    except Exception:  # noqa: BLE001 — TB optional, like the SSC trainer
        logging.warning("tensorboardX unavailable; scalar logs only")

    saver = AsyncSaver()
    for step in range(start_step, max_steps):
        batch_np = sampler()
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, jax.device_put(batch_np), sub)
        if (step + 1) % log_every == 0:
            m = jax.device_get(metrics)
            logging.info(
                "step %d gen %.4f disc %.4f mel %.4f", step + 1,
                float(m["train/gen_loss"]), float(m["train/disc_loss"]),
                float(m["train/mel_loss"]),
            )
            if writer is not None:
                for k, v in m.items():
                    writer.add_scalar(k, float(v), step + 1)
        if (step + 1) % save_every == 0 or step + 1 == max_steps:
            # background-committing save (same snapshot semantics as the
            # SSC trainer): the GAN step loop never stalls on the write
            saver.save(
                args.outdir, step + 1,
                {"generator": state.gen_params,
                 "discriminator": state.disc_params},
            )
    saver.wait()
    if writer is not None:
        writer.close()
    logging.info("vocoder training finished at %d steps", max_steps)


if __name__ == "__main__":
    main()
