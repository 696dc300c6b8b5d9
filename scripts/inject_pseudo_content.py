#!/usr/bin/env python3
"""Inject deterministic pseudo-content features into feature dumps.

Stand-in for ContentVec in the full-budget validation run: the axon
tunnel currently wedges on the ContentVec conv stack (see ROADMAP round-4
notes), and a CPU forward of the 95M-param encoder would take hours for a
multi-hour corpus on this 1-core host.  The recipe e2e tests use the same
injection pattern (tests/test_recipe.py: "hubert features are injected
between stages").

The pseudo-content is a fixed seeded 2-layer random projection of a
128-bin log-mel of the waveform — deterministic, style-leaky like real
ContentVec, and carrying the melody/vowel content the conversion task
must preserve.  Computed jitted on the default backend with 64-frame
bucket padding (one compile per bucket).

Usage:
  python scripts/inject_pseudo_content.py --dumpdir dump_fb/train [...]
"""

import argparse
import functools
import glob

import numpy as np

SR = 24000
HOP = 240
CONTENT_DIM = 768
MEL_BINS = 128
BUCKET = 64 * HOP  # 64 frames of samples


@functools.lru_cache(maxsize=None)
def _program(n_samples: int):
    import jax
    import jax.numpy as jnp

    from serenade_tpu.ops.mel import logmelfilterbank

    rng = np.random.default_rng(20260819)
    w1 = jnp.asarray(rng.normal(size=(MEL_BINS, 1024)).astype(np.float32)
                     / np.sqrt(MEL_BINS))
    w2 = jnp.asarray(rng.normal(size=(1024, CONTENT_DIM)).astype(np.float32)
                     / 32.0)

    @jax.jit
    def fn(wav):
        mel = logmelfilterbank(wav, SR, fft_size=512, hop_size=HOP,
                               win_length=480, num_mels=MEL_BINS,
                               fmin=40.0, fmax=11800.0, eps=1e-6)
        return jnp.tanh(mel @ w1) @ w2

    return fn


def pseudo_content(wave: np.ndarray, n_frames: int) -> np.ndarray:
    padded = ((len(wave) + BUCKET - 1) // BUCKET) * BUCKET
    wav = np.pad(np.asarray(wave, np.float32), (0, padded - len(wave)))
    import jax.numpy as jnp

    out = np.asarray(_program(padded)(jnp.asarray(wav)))
    if out.shape[0] < n_frames:
        out = np.pad(out, ((0, n_frames - out.shape[0]), (0, 0)),
                     mode="edge")
    return out[:n_frames].astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dumpdir", nargs="+", required=True)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args()

    from serenade_tpu.utils.h5 import read_hdf5_many, write_hdf5

    for d in args.dumpdir:
        files = sorted(glob.glob(f"{d}/*.h5"))
        n = 0
        for path in files:
            item = read_hdf5_many(path, ("hubert", "wave", "logmel"))
            if item["hubert"] is not None and not args.overwrite:
                continue
            hub = pseudo_content(item["wave"], item["logmel"].shape[0])
            write_hdf5(path, "hubert", hub)
            n += 1
        print(f"{d}: injected hubert into {n}/{len(files)} dumps")


if __name__ == "__main__":
    main()
