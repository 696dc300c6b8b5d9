"""Vocoder wrapper: stats denorm/renorm around the HiFiGAN generator.

Counterpart of reference vocoder/vocoder.py:11-75 and vocoder/utils.py:14-63:
resolves checkpoint/config/stats, converts the torch pickle to flax params,
and exposes ``decode``/``decode_batch`` with the same normalization contract
(denormalize by the SSC model's target stats, renormalize by the vocoder's
own training stats) and per-utterance RTF logging.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import numpy as np
import yaml

from serenade_tpu.utils.h5 import read_hdf5
from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

logger = logging.getLogger(__name__)


_CHECKPOINT_FREE_GENERATORS = ("griffinlim", "griffin_lim")


def vocoder_available(voc_cfg: dict) -> bool:
    """Whether a `vocoder:` config section can actually synthesize.

    True when the checkpoint exists on disk, or when the vocoder config
    yaml declares a checkpoint-free generator (GriffinLim) — the gate the
    CLIs/serving use before constructing :class:`Vocoder`."""
    import os

    voc_cfg = voc_cfg or {}
    ckpt = voc_cfg.get("checkpoint")
    if ckpt and os.path.exists(str(ckpt)):
        return True
    cfg_path = voc_cfg.get("config")
    if cfg_path and os.path.exists(str(cfg_path)):
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f) or {}
        gtype = str(cfg.get("generator_type", "")).lower()
        return gtype in _CHECKPOINT_FREE_GENERATORS
    return False


def load_vocoder(checkpoint: str, config: dict):
    """Build the generator + converted params from a torch checkpoint.

    Handles the reference's historical `upsample_kernal_sizes` typo
    (vocoder/utils.py:40-43).
    """
    from serenade_tpu.vocoder.convert import (
        convert_hifigan_generator,
        load_torch_vocoder_checkpoint,
    )

    if str(config.get("generator_type", "")).lower() in (
            "griffinlim", "griffin_lim"):
        # checkpoint-free deterministic inversion (framework-validation
        # runs without a trained HiFiGAN); see vocoder/griffin_lim.py
        from serenade_tpu.vocoder.griffin_lim import GriffinLimSynth

        gp = dict(config.get("generator_params", {}))
        return GriffinLimSynth(
            sampling_rate=int(config.get("sampling_rate", 24000)),
            fft_size=int(gp.get("fft_size", 512)),
            hop_size=int(gp.get("hop_size", 240)),
            win_length=int(gp.get("win_length", 480)),
            num_mels=int(gp.get("num_mels", gp.get("in_channels", 80))),
            fmin=float(gp.get("fmin", 63.0)),
            fmax=float(gp.get("fmax", 12000.0)),
            n_iter=int(gp.get("n_iter", 32)),
            log_base=float(gp.get("log_base", 10.0)),
        ), {}

    gp = dict(config.get("generator_params", {}))
    if "upsample_kernal_sizes" in gp:
        gp["upsample_kernel_sizes"] = gp.pop("upsample_kernal_sizes")
    model = HiFiGANGenerator(
        in_channels=gp.get("in_channels", 80),
        out_channels=gp.get("out_channels", 1),
        channels=gp.get("channels", 512),
        kernel_size=gp.get("kernel_size", 7),
        upsample_scales=tuple(gp.get("upsample_scales", (8, 8, 2, 2))),
        upsample_kernel_sizes=tuple(
            gp.get("upsample_kernel_sizes", (16, 16, 4, 4))
        ),
        resblock_kernel_sizes=tuple(gp.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilations=tuple(
            tuple(d) for d in gp.get("resblock_dilations", ((1, 3, 5),) * 3)
        ),
        use_additional_convs=gp.get("use_additional_convs", True),
        # inference wrapper: fuse the residual branches through the Pallas
        # kernel on TPU (measured +24% synthesis throughput); training and
        # CPU keep the differentiable conv lowering
        resblock_backend=(
            "fused" if jax.default_backend() not in ("cpu", "gpu")
            else "conv"),
    )
    import os

    if os.path.isdir(checkpoint):
        # orbax checkpoint from serenade-vocoder-train; its stats.h5
        # (identity — training consumed raw logmel) sits beside it
        from serenade_tpu.checkpoint import restore_generator_params

        params = restore_generator_params(checkpoint)
        return model, params
    sd = load_torch_vocoder_checkpoint(checkpoint)
    params = convert_hifigan_generator(
        sd,
        num_upsamples=len(model.upsample_scales),
        num_blocks=len(model.resblock_kernel_sizes),
        resblock_dilations=model.resblock_dilations,
        use_additional_convs=model.use_additional_convs,
    )
    return model, params


class Vocoder:
    def __init__(self, checkpoint: str, config: str, stats: str,
                 trg_stats: Optional[dict] = None, take_norm_feat: bool = True):
        if take_norm_feat and trg_stats is None:
            raise ValueError("trg_stats required when take_norm_feat=True")
        self.take_norm_feat = take_norm_feat
        if trg_stats is not None:
            self.trg_stats = {
                "mean": np.asarray(trg_stats["mean"], np.float32),
                "scale": np.asarray(trg_stats["scale"], np.float32),
            }
        with open(config) as f:
            self.config = yaml.safe_load(f)
        self.model, self.params = load_vocoder(checkpoint, self.config)
        mean, scale = read_hdf5(stats, "mean"), read_hdf5(stats, "scale")
        if mean is None or scale is None:
            # np.asarray(None, float32) is NaN, which would silently turn
            # every decoded waveform into NaN downstream (caught live in
            # the round-5 real-content run: conf hardcoded a stats path
            # from a different dumpdir).  Fail loudly instead.
            raise FileNotFoundError(
                f"vocoder stats missing or incomplete: {stats}")
        self.stats = {
            "mean": np.asarray(mean, np.float32),
            "scale": np.asarray(scale, np.float32),
        }
        self.sampling_rate = int(self.config.get("sampling_rate", 24000))
        self._infer = jax.jit(
            lambda params, c: self.model.apply(params, c)
        )

    def _normalize(self, c):
        c = np.asarray(c, np.float32)
        if self.take_norm_feat:
            c = c * self.trg_stats["scale"] + self.trg_stats["mean"]
        return (c - self.stats["mean"]) / self.stats["scale"]

    def decode(self, c):
        """c: (T, in_channels) mel -> (T * hop,) waveform, sampling rate."""
        c = self._normalize(c)
        start = time.time()
        y = self._infer(self.params, c[None])[0, :, 0]
        y = np.asarray(jax.device_get(y))
        rtf = (time.time() - start) / (len(y) / self.sampling_rate)
        logger.info("waveform generated (RTF = %.3f)", rtf)
        return y, self.sampling_rate

    def decode_batch(self, c):
        """c: (B, T, in_channels) -> (B, T * hop)."""
        c = self._normalize(c)
        y = self._infer(self.params, c)
        return np.asarray(jax.device_get(y))[..., 0]

    def place_on_mesh(self, mesh):
        """Replicate the generator params over a dp mesh so
        ``decode_batch_device`` composes with mesh-sharded conversion
        outputs: GSPMD partitions the batch over 'data' (each chip
        vocodes its own sub-batch, no collectives) while the params
        replicate.  Serving calls this once when the Converter runs with
        ``data_mesh`` (serve --data-axis on a pod slice)."""
        from serenade_tpu.parallel import replicated

        self.params = jax.device_put(self.params, replicated(mesh))
        self._mesh = mesh

    def decode_batch_device(self, c, lengths):
        """Device-resident batch decode for the serving dispatcher.

        ``c`` is the conversion output still on device ((B, T, mels),
        normalized mel space); ``lengths`` are true frame counts per row.
        One jitted program edge-pads each row past its length (repeating
        the last real frame — zero-padding in normalized mel space means
        average energy, which is audible through the conv receptive
        field), denormalizes, runs the generator, and quantizes to int16
        (exactly the PCM16 the RIFF writer emits) — so the waveform
        fetch is half the bytes and the mel is never re-uploaded.
        Returns an int16 (B, T * hop) DEVICE array.

        After :meth:`place_on_mesh`, the same program runs SPMD over the
        mesh's 'data' axis (B must divide by the axis size — the mesh
        conversion path already pads batches to that multiple)."""
        import jax.numpy as jnp

        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.shape["data"]
            if c.shape[0] % n_dev != 0:
                raise ValueError(
                    f"batch {c.shape[0]} not divisible by the {n_dev}-way "
                    "data mesh; pad the batch (the mesh conversion path "
                    "does this automatically)")
            c = jax.device_put(c, NamedSharding(mesh, P("data", None, None)))
            lengths = jax.device_put(
                jnp.asarray(lengths, jnp.int32),
                NamedSharding(mesh, P("data")))

        if not hasattr(self, "_infer_tail"):
            def tail(params, c, lengths):
                T = c.shape[1]
                idx = jnp.minimum(jnp.arange(T)[None, :],
                                  (lengths - 1)[:, None])
                c = jnp.take_along_axis(c, idx[:, :, None], axis=1)
                if self.take_norm_feat:
                    c = (c * self.trg_stats["scale"]
                         + self.trg_stats["mean"])
                c = (c - self.stats["mean"]) / self.stats["scale"]
                y = self.model.apply(params, c)[..., 0]
                return jnp.round(
                    jnp.clip(y, -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)

            self._infer_tail = jax.jit(tail)
        return self._infer_tail(self.params, c,
                                jnp.asarray(lengths, jnp.int32))
