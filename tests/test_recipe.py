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


@pytest.mark.slow
def test_recipe_full_pipeline_stages_0_to_9(tmp_path):
    """The ENTIRE run.sh stage graph 0->9 through the real shell script on
    a tiny synthetic corpus: data prep, sharded extraction, stats, 2-step
    training, dev/test decode, train-set decode, cyclic feature
    re-extraction + injection, cyclic fine-tune, cyclic decode, and SiFiGAN
    postprocessing with an in-framework orbax checkpoint.

    This covers exactly the shell-level plumbing the CLI-level e2e tests
    cannot: checkpoint autodiscovery (latest_ckpt), ${suffix} wiring,
    decode flag pass-through, and the stage-9 sifigan_ckpt/conf flags.
    hubert features are injected between stages (a real ContentVec is too
    heavy for CI; --allow-missing-hubert covers the extraction path).
    """
    import jax
    import jax.numpy as jnp

    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.sifigan import SiFiGANGenerator
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

    CONTENT_DIM, N_MELS = 16, 16

    db = tmp_path / "db"
    # per-song style groups like real GTSinger: decode skips converting an
    # utterance to its OWN style (`if style in utt_id`, the reference
    # semantics), and stage 5's random-ref lookup needs at least two
    # styles in the train split (song1+song4) to cross-convert
    for song, style, freq in (("song1", "Breathy", 220.0),
                              ("song2", "Falsetto", 262.0),
                              ("song3", "Pharyngeal", 294.0),
                              ("song4", "Mixed_Voice", 330.0)):
        d = db / "EN" / "Tenor1" / song / f"{style}_Group"
        d.mkdir(parents=True)
        t = np.arange(int(0.6 * SR)) / SR
        write_wav(str(d / "0000.wav"),
                  (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32), SR)

    # tiny trainable vocoder checkpoint (upsample product == hop 240)
    voc_dir = tmp_path / "voc"
    gp = dict(in_channels=N_MELS, channels=32, upsample_scales=[8, 6, 5],
              upsample_kernel_sizes=[16, 12, 10], resblock_kernel_sizes=[3],
              resblock_dilations=[[1, 3]], use_additional_convs=True)
    gen = HiFiGANGenerator(
        in_channels=N_MELS, channels=32, upsample_scales=(8, 6, 5),
        upsample_kernel_sizes=(16, 12, 10), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    voc_params = gen.init(jax.random.key(0), jnp.zeros((1, 10, N_MELS)))
    save_checkpoint(str(voc_dir), 1, {"generator": voc_params,
                                      "discriminator": {}})
    voc_yml = tmp_path / "voc.yml"
    with open(voc_yml, "w") as f:
        yaml.safe_dump(dict(sampling_rate=SR, generator_params=gp), f)
    voc_stats = str(tmp_path / "voc_stats.h5")
    write_hdf5(voc_stats, "mean", np.zeros(N_MELS, np.float32))
    write_hdf5(voc_stats, "scale", np.ones(N_MELS, np.float32))

    # tiny in-framework SiFiGAN checkpoint for stage 9
    sifi_dir = tmp_path / "sifi"
    sifi = SiFiGANGenerator(
        in_channels=43, channels=32, upsample_scales=(5, 4, 3, 2),
        upsample_kernel_sizes=(10, 8, 6, 4),
    )
    dfs = [jnp.ones((1, 25 * int(c))) for c in np.cumprod([5, 4, 3, 2])]
    sifi_params = sifi.init(jax.random.key(1), jnp.zeros((1, 25 * 120, 1)),
                            jnp.zeros((1, 25, 43)), dfs)
    save_checkpoint(str(sifi_dir), 1, {"generator": sifi_params,
                                       "discriminator": {}})
    sifi_yml = tmp_path / "sifi.yml"
    with open(sifi_yml, "w") as f:
        yaml.safe_dump(dict(sample_rate=SR, generator=dict(
            in_channels=43, channels=32, upsample_scales=[5, 4, 3, 2],
            upsample_kernel_sizes=[10, 8, 6, 4])), f)

    base_conf = dict(
        sampling_rate=SR, fft_size=512, hop_size=240, win_length=480,
        shiftms=10, num_mels=N_MELS, fmin=63, fmax=11000, eps=1.0e-6,
        model_type="Serenade",
        model_params=dict(
            input_dim=CONTENT_DIM, output_dim=N_MELS, encoder_channels=16,
            decoder_channels=32, gst_embed_dim=16,
            decoder_attention_head_dim=16, dtype="float32",
        ),
        trainer_type="SSCTrainer", collater_type="SSCCollater",
        score_type="est_lf0_score", logmel_type="logmel",
        batch_size=2, optimizer_type="AdamW",
        optimizer_params=dict(lr=1.0e-4), grad_norm=1.0,
        scheduler_type="MultiStepLR",
        scheduler_params=dict(gamma=0.5, milestones=[100]),
        train_max_steps=2, save_interval_steps=1000,
        eval_interval_steps=1000, log_interval_steps=1,
        num_save_intermediate_results=1,
        vocoder=dict(checkpoint=str(voc_dir / "checkpoint-1steps"),
                     config=str(voc_yml), stats=voc_stats),
    )
    conf = tmp_path / "tiny.yaml"
    with open(conf, "w") as f:
        yaml.safe_dump(base_conf, f)
    cyc_conf = tmp_path / "tiny_cyclic.yaml"
    with open(cyc_conf, "w") as f:
        yaml.safe_dump(dict(base_conf, logmel_type="cyclic_logmel"), f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # the pytest parent forces an 8-device virtual mesh (conftest); the
    # recipe subprocesses must see ONE device or training's default data
    # axis inflates the global batch past the 3-utterance corpus
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/serenade_tpu_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    work = tmp_path / "work"
    work.mkdir()
    for sub in ("local", "utils", "conf"):
        os.symlink(os.path.join(os.path.abspath(RECIPE), sub), work / sub)
    for f in ("run.sh", "cmd.sh", "path.sh"):
        os.symlink(os.path.join(os.path.abspath(RECIPE), f), work / f)

    def run_stages(a, b, *extra):
        res = subprocess.run(
            ["bash", "run.sh", "--stage", str(a), "--stop_stage", str(b),
             "--db_root", str(db), "--conf", str(conf),
             "--cyclic_conf", str(cyc_conf), "--skip_gtmidi", "true",
             "--n_jobs", "2", "--decode_batch_size", "2",
             "--ref_dict", str(tmp_path / "refstyles.json"), *extra],
            cwd=work, env=env, capture_output=True, text=True, timeout=2400,
        )
        assert res.returncode == 0, (
            f"stages {a}-{b} failed:\n{res.stdout[-4000:]}\n"
            f"{res.stderr[-4000:]}")
        return res

    def inject_hubert(dumpdir):
        rng = np.random.default_rng(7)
        for h5 in sorted(dumpdir.glob("*.h5")):
            n = np.asarray(read_hdf5(str(h5), "logmel")).shape[0]
            write_hdf5(str(h5), "hubert",
                       rng.normal(size=(n, CONTENT_DIM)).astype(np.float32))

    run_stages(0, 1)
    for split in ("train", "dev", "test"):
        dumps = list((work / "dump" / split).glob("*.h5"))
        assert dumps, split
        inject_hubert(work / "dump" / split)
    dev_h5 = sorted((work / "dump" / "dev").glob("*.h5"))[0]
    with open(tmp_path / "refstyles.json", "w") as f:
        f.write('{"Breathy": "%s"}' % dev_h5)

    run_stages(2, 6)
    # stage 3: checkpoint written and autodiscoverable
    assert (work / "exp" / "serenade" / "checkpoint-2steps").is_dir()
    # stage 4: decoded wav + lf0 h5 for dev and test
    for split in ("dev", "test"):
        wavs = list((work / "exp" / "serenade" / "decoded" / split)
                    .glob("*_Breathy.wav"))
        assert wavs, split
        lf0 = read_hdf5(str(wavs[0]).replace(".wav", ".h5"), "lf0")
        assert lf0 is not None and np.isfinite(lf0).all()
        y, sr = __import__("serenade_tpu.utils.audio",
                           fromlist=["read_wav"]).read_wav(str(wavs[0]))
        assert sr == SR and np.isfinite(y).all() and len(y) > 0
    # stage 5 + 6: converted-train dumps carry cyclic_logmel (the
    # Breathy train song cross-converted to the Mixed_Voice ref and/or
    # vice versa via the random style lookup)
    cyc_dumps = [p for p in (work / "dump" / "train_cyclic").glob("*.h5")
                 if p.stem.endswith(("_Breathy", "_Falsetto", "_Pharyngeal",
                                     "_Mixed_Voice"))]
    assert cyc_dumps, list((work / "dump" / "train_cyclic").glob("*"))
    cl = read_hdf5(str(cyc_dumps[0]), "cyclic_logmel")
    assert cl is not None and np.isfinite(cl).all() and cl.shape[1] == N_MELS

    inject_hubert(work / "dump" / "train_cyclic")
    run_stages(7, 10, "--sifigan_ckpt", str(sifi_dir / "checkpoint-1steps"),
               "--sifigan_conf", str(sifi_yml))
    # stage 7: cyclic experiment trained from the stage-3 checkpoint
    assert (work / "exp" / "serenade_cyclic" / "checkpoint-2steps").is_dir()
    # stage 8: cyclic decodes exist
    for split in ("dev", "test"):
        wavs = list((work / "exp" / "serenade_cyclic" / "decoded" / split)
                    .glob("*_Breathy.wav"))
        assert wavs, split
    # stage 9: sifigan re-synthesis written and finite
    sifi_wavs = list((work / "exp" / "serenade_cyclic" / "decoded")
                     .glob("**/*_sifigan.wav"))
    assert sifi_wavs
    from serenade_tpu.utils.audio import read_wav

    y, sr = read_wav(str(sifi_wavs[0]))
    assert sr == SR and np.isfinite(y).all() and len(y) > 0
    # stage 10: objective evaluation written, pairs found via wav.scp,
    # summary metrics finite
    import json

    for split in ("dev", "test"):
        ev = work / "exp" / "serenade_cyclic" / "decoded" / split / \
            "eval.json"
        assert ev.is_file(), split
        result = json.loads(ev.read_text())
        assert result["summary"]["n_utts"] >= 1
        assert np.isfinite(result["summary"]["mcd_db"])
        for m in result["per_utterance"].values():
            assert np.isfinite(m["mcd_db"]) and m["frames"] > 0
