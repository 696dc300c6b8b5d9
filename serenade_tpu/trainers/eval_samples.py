"""Intermediate-sample generation during training.

Counterpart of reference trainers/ssc.py:103-233
(`_generate_and_save_intermediate_result`): every eval interval, take the
first dev batch, run self-reference inference (source conditioned on
itself), vocode prediction and ground truth, and write wav + mel-comparison
PNGs under ``<outdir>/predictions/<steps>steps/`` — listening/inspection is
the test (SURVEY §4.2).
"""

from __future__ import annotations

import logging
import os
import numpy as np

logger = logging.getLogger(__name__)


def make_eval_fn(model, dev_batch, *, outdir: str,
                 vocoder=None, num_save: int = 8, n_timesteps: int = 10,
                 batch_rename=None):
    """Build an ``eval_fn(state, steps)`` for SSCTrainer.

    EVERY process runs the jitted inference (it is a collective program
    when params are mesh-sharded — a rank-gated call would deadlock
    multi-host); only process 0 does the host IO (plots/wavs)."""
    import jax

    rename = batch_rename or {"xs": "x", "ys": "logmel", "scores": "midi",
                              "louds": "loud", "lens": "lengths"}
    batch = {rename.get(k, k): np.asarray(v) for k, v in dev_batch.items()}

    with_fluc = "f0_fluc" in batch

    @jax.jit
    def infer(params, b, key):
        # the batch rides as a jit ARGUMENT: baked-in closure constants
        # would bloat the HLO with the whole dev batch and pin a copy in
        # device memory for the entire run
        args = [b["x"], b["lengths"], b["midi"], b["loud"]]
        if with_fluc:
            args.append(b["f0_fluc"])
        args += [b["x"], b["lengths"], b["logmel"], b["midi"], b["loud"]]
        if with_fluc:
            args.append(b["f0_fluc"])
        return model.apply(params, *args, rng=key, n_timesteps=n_timesteps,
                           method="inference")

    def eval_fn(state, steps: int):
        out = infer(state.params, batch, jax.random.key(steps))
        if jax.process_index() != 0:
            jax.block_until_ready(out)
            return
        dirname = os.path.join(outdir, "predictions", f"{steps}steps")
        os.makedirs(dirname, exist_ok=True)
        mel_pred = np.asarray(jax.device_get(out))
        n = min(num_save, mel_pred.shape[0])
        for i in range(n):
            T = int(batch["lengths"][i])
            pred = mel_pred[i, :T]
            gt = np.asarray(batch["logmel"][i][:T])
            _save_mel_plot(
                os.path.join(dirname, f"sample{i}_mel.png"), pred, gt
            )
            if vocoder is not None:
                try:
                    from serenade_tpu.utils.audio import write_wav

                    y, sr = vocoder.decode(pred)
                    write_wav(os.path.join(dirname, f"sample{i}_gen.wav"),
                              y, sr)
                    y_gt, sr = vocoder.decode(gt)
                    write_wav(os.path.join(dirname, f"sample{i}_gt.wav"),
                              y_gt, sr)
                except Exception:
                    logger.exception("vocoding eval sample failed")
        logger.info("wrote %d eval samples to %s", n, dirname)

    return eval_fn


def _save_mel_plot(path: str, pred: np.ndarray, gt: np.ndarray):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return
    fig, axes = plt.subplots(2, 1, figsize=(10, 6))
    axes[0].imshow(gt.T, aspect="auto", origin="lower")
    axes[0].set_title("ground truth")
    axes[1].imshow(pred.T, aspect="auto", origin="lower")
    axes[1].set_title("prediction")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
