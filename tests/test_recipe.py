"""Recipe smoke test: run.sh stages 0-2 on synthetic data, plus the cyclic
dump injection script."""

import os
import subprocess

import numpy as np
import pytest
import yaml

from serenade_tpu.utils.audio import write_wav
from serenade_tpu.utils.h5 import read_hdf5, write_hdf5

RECIPE = os.path.join(os.path.dirname(__file__), "..", "egs", "gtsinger",
                      "ssc1")
SR = 24000


@pytest.mark.slow
def test_recipe_stages_0_to_2(tmp_path):
    # synthetic GTSinger-ish tree: <lang>/<singer>/<song>/<group>/xxx.wav
    db = tmp_path / "db"
    for song, freq in (("song1", 220.0), ("song2", 262.0), ("song3", 330.0)):
        d = db / "EN" / "s1" / song / "Breathy_Group"
        d.mkdir(parents=True)
        t = np.arange(int(0.6 * SR)) / SR
        write_wav(str(d / "0000.wav"),
                  (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32), SR)

    # tiny config so stage-1/2 run fast; model params irrelevant here
    conf = tmp_path / "tiny.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(dict(
            sampling_rate=SR, fft_size=512, hop_size=240, win_length=480,
            shiftms=10, num_mels=16, fmin=63, fmax=11000, eps=1.0e-6,
            score_type="est_lf0_score",
        ), f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the remote-TPU plugin out of subprocesses entirely: its
    # registration handshake can hang when processes race for the tunnel
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # share the persistent XLA cache so shard subprocesses don't recompile
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/serenade_tpu_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    work = tmp_path / "work"
    work.mkdir()
    # run stages from a scratch dir but with recipe scripts from the repo
    for sub in ("local", "utils", "conf"):
        os.symlink(os.path.join(os.path.abspath(RECIPE), sub),
                   work / sub)
    for f in ("run.sh", "cmd.sh", "path.sh"):
        os.symlink(os.path.join(os.path.abspath(RECIPE), f), work / f)

    res = subprocess.run(
        ["bash", "run.sh", "--stage", "0", "--stop_stage", "2",
         "--db_root", str(db), "--conf", str(conf),
         "--skip_gtmidi", "true", "--n_jobs", "2"],
        cwd=work, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert res.returncode == 0, res.stdout + res.stderr

    # stage 0 artifacts
    assert (work / "data" / "train" / "wav.scp").exists()
    # stage 1 dumps (train has all 3 utts)
    dumps = list((work / "dump" / "train").glob("*.h5"))
    assert len(dumps) == 3
    mel = read_hdf5(str(dumps[0]), "logmel")
    assert mel is not None and mel.shape[1] == 16
    # stage 2 stats
    assert (work / "dump" / "stats.joblib").exists()


def test_cyclic_dump_injection(tmp_path):
    src = tmp_path / "src"
    cyc = tmp_path / "cyc"
    src.mkdir()
    cyc.mkdir()
    mel = np.random.default_rng(0).normal(size=(50, 8)).astype(np.float32)
    write_hdf5(str(src / "utt1.h5"), "logmel", mel)
    write_hdf5(str(cyc / "utt1_Falsetto.h5"), "logmel",
               np.zeros((50, 8), np.float32))

    res = subprocess.run(
        ["python", os.path.join(RECIPE, "local", "create_cyclic_dump.py"),
         "--src-dumpdir", str(src), "--cyclic-dumpdir", str(cyc)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    got = read_hdf5(str(cyc / "utt1_Falsetto.h5"), "cyclic_logmel")
    np.testing.assert_array_equal(got, mel)
