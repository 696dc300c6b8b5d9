#!/usr/bin/env python3
"""Run the REAL training CLI on the TPU with synthetic dumps: validates the
CLI path (dataset → loader → mesh → jitted step → orbax save → decode)
on hardware, not just the CPU test mesh.

Stages are resumable (fixed --workdir): prep | train | decode | all.
"""

import argparse
import os
import subprocess
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 24000
UTTS = ["EN_s1_a_Breathy_Group_0", "EN_s1_b_Falsetto_Group_0",
        "EN_s1_c_Pharyngeal_Group_0", "EN_s1_d_Mixed_Voice_Group_0"]

CONFIG = dict(
    sampling_rate=SR, fft_size=512, hop_size=240, win_length=480,
    shiftms=10, num_mels=80, fmin=63, fmax=12000, eps=1.0e-6,
    model_type="Serenade",
    model_params=dict(input_dim=768, output_dim=80, encoder_channels=80,
                      decoder_channels=512, gst_embed_dim=256,
                      decoder_attention_head_dim=512),
    trainer_type="SSCTrainer", collater_type="SSCCollater",
    score_type="est_lf0_score", logmel_type="logmel",
    batch_size=2,
    optimizer_type="AdamW", optimizer_params=dict(lr=2.0e-4),
    grad_norm=1.0, scheduler_type="MultiStepLR",
    scheduler_params=dict(gamma=0.5, milestones=[100000]),
    train_max_steps=30, save_interval_steps=30,
    eval_interval_steps=1000, log_interval_steps=10,
)


def run_cli(mod, *argv):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    r = subprocess.run([sys.executable, "-m", mod, *argv],
                       capture_output=True, text=True, env=env)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-12:])
    print(f"--- {mod} (rc={r.returncode}) ---\n{tail}")
    if r.returncode != 0:
        sys.exit(1)


def stage_prep(work, dump, cfg_path):
    from serenade_tpu.features import FeatureConfig, extract_features
    from serenade_tpu.utils.audio import read_wav, write_wav
    from serenade_tpu.utils.h5 import write_hdf5

    rng = np.random.default_rng(0)
    fc = FeatureConfig.from_dict(CONFIG)

    def content_fn(a):
        n = max(len(a) // 160, 1)
        return rng.normal(size=(n, 768)).astype(np.float32) * 0.5

    for utt, freq in zip(UTTS, (196.0, 262.0, 330.0, 392.0)):
        t = np.arange(int(1.5 * SR)) / SR
        wav = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        path = os.path.join(work, f"{utt}.wav")
        write_wav(path, wav, SR)
        audio, fs = read_wav(path)
        feats = extract_features(utt, audio, fs, fc, content_fn=content_fn)
        for k, v in feats.items():
            write_hdf5(os.path.join(dump, f"{utt}.h5"), k, v)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CONFIG, f)
    run_cli("serenade_tpu.bin.compute_statistics", "--rootdir", dump,
            "--dumpdir", work, "--config", cfg_path)
    print(f"PREP OK: dumps + stats in {work}")


def stage_train(work, dump, cfg_path):
    run_cli("serenade_tpu.bin.ssc_train",
            "--train-dumpdir", dump, "--dev-dumpdir", dump,
            "--stats", os.path.join(work, "stats.joblib"),
            "--outdir", os.path.join(work, "exp"), "--config", cfg_path)
    print("TRAIN OK")


def stage_decode(work, dump, cfg_path):
    from serenade_tpu.checkpoint import find_latest_checkpoint

    ckpt = find_latest_checkpoint(os.path.join(work, "exp"))
    assert ckpt, "no checkpoint written"
    run_cli("serenade_tpu.bin.ssc_decode",
            "--dumpdir", dump, "--stats", os.path.join(work, "stats.joblib"),
            "--outdir", os.path.join(work, "decoded"), "--checkpoint", ckpt,
            "--n-timesteps", "10", "--batch-size", "4")
    n_out = len([f for f in os.listdir(os.path.join(work, "decoded"))
                 if f.endswith(".h5")])
    print(f"TPU CLI CHECK OK: checkpoint {os.path.basename(ckpt)}, "
          f"{n_out} decoded outputs")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tpu_cli_check")
    ap.add_argument("--stage", choices=("prep", "train", "decode", "all"),
                    default="all")
    args = ap.parse_args()
    work = args.workdir
    dump = os.path.join(work, "dump")
    os.makedirs(dump, exist_ok=True)
    cfg_path = os.path.join(work, "config.yml")

    if args.stage in ("prep", "all"):
        stage_prep(work, dump, cfg_path)
    if args.stage in ("train", "all"):
        stage_train(work, dump, cfg_path)
    if args.stage in ("decode", "all"):
        stage_decode(work, dump, cfg_path)


if __name__ == "__main__":
    main()
