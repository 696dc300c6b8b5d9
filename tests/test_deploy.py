"""AOT export/deploy: StableHLO artifact round trip vs the live Converter."""

import os

import numpy as np
import pytest
import yaml


def _tiny_experiment(tmp_path):
    """Train the tiny e2e experiment and return (expdir, stats, items)."""
    from tests.test_e2e_pipeline import (
        TINY_CONFIG, UTTS, fake_content_fn, synth_wav, _run_cli,
    )
    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_train import main as train_main
    from serenade_tpu.features import FeatureConfig, extract_features
    from serenade_tpu.utils.audio import read_wav
    from serenade_tpu.utils.h5 import write_hdf5

    dump = tmp_path / "dump"
    dump.mkdir()
    fc = FeatureConfig.from_dict(TINY_CONFIG)
    items = {}
    for utt, freq in UTTS[:2]:
        wav_path = tmp_path / f"{utt}.wav"
        synth_wav(str(wav_path), freq)
        audio, fs = read_wav(str(wav_path))
        feats = extract_features(utt, audio, fs, fc,
                                 content_fn=fake_content_fn)
        for k, v in feats.items():
            write_hdf5(str(dump / f"{utt}.h5"), k, v)
        feats["score"] = feats["est_lf0_score"]
        items[utt] = feats

    cfg = tmp_path / "config.yml"
    with open(cfg, "w") as f:
        yaml.safe_dump(TINY_CONFIG, f)
    _run_cli(stats_main, ["--rootdir", str(dump), "--dumpdir",
                          str(tmp_path), "--config", str(cfg)])
    _run_cli(train_main, [
        "--train-dumpdir", str(dump), "--dev-dumpdir", str(dump),
        "--stats", str(tmp_path / "stats.joblib"), "--outdir",
        str(tmp_path / "exp"), "--config", str(cfg), "--data-axis", "1",
    ])
    return str(tmp_path / "exp"), str(tmp_path / "stats.joblib"), items


def test_export_roundtrip_matches_converter(tmp_path):
    from tests.test_e2e_pipeline import UTTS
    from serenade_tpu.api import Converter
    from serenade_tpu.deploy import ExportedConverter, export_converter, load

    expdir, stats, items = _tiny_experiment(tmp_path)
    (src, _), (ref, _) = UTTS[:2]
    t_src = items[src]["hubert"].shape[0]
    t_ref = items[ref]["hubert"].shape[0]

    from serenade_tpu.collaters.ssc import bucket_length

    conv = Converter(expdir, stats, n_timesteps=2, seed=7)
    art = str(tmp_path / "export")
    # first bucket matches the live Converter's packing (bucket_length), so
    # the two paths draw the SAME padded shapes -> the same CFM noise
    ts = bucket_length(t_src)
    tr = bucket_length(t_ref)
    manifest = export_converter(conv, art, buckets=((ts, tr), (512, 256)))

    assert os.path.exists(os.path.join(art, "manifest.json"))
    assert len(manifest["files"]) == 2
    for fname in manifest["files"].values():
        assert os.path.getsize(os.path.join(art, fname)) > 1000
    assert manifest["has_vocoder"] is False
    assert "cpu" in manifest["platforms"]

    # the artifact runs standalone and matches the live Converter: same
    # seed => the key chains split identically, normalization is baked into
    # the program, and the matching bucket gives identical padded shapes;
    # residual difference is AOT-vs-JIT compilation of the same program
    exp = load(art, seed=7)
    assert isinstance(exp, ExportedConverter)
    mel_live, wav, sr = conv.convert_features(items[src], items[ref])
    mel_exp, wav_e, sr_e = exp.convert_features(items[src], items[ref])
    assert wav is None and wav_e is None and sr_e is None
    assert mel_exp.shape == (t_src, mel_live.shape[1]) == mel_live.shape
    assert np.isfinite(mel_exp).all()
    np.testing.assert_allclose(mel_exp, mel_live, atol=1e-4, rtol=1e-4)

    # the PRNG chain advances per call: a second conversion differs
    mel_exp2, _, _ = exp.convert_features(items[src], items[ref])
    assert np.abs(mel_exp2 - mel_exp).max() > 1e-6

    # a larger bucket samples DIFFERENT noise but the same flow: outputs
    # correlate strongly without being equal (padding-invariant
    # conditioning, fresh z draw over the longer packed sequence)
    exp_big = load(art, seed=7)
    exp_big.manifest["buckets"] = [[512, 256]]  # force the big bucket
    mel_big, _, _ = exp_big.convert_features(items[src], items[ref])
    corr = np.corrcoef(mel_big.ravel(), mel_live.ravel())[0, 1]
    assert corr > 0.99, f"corr {corr:.4f}"

    # bucket selection: too-long sources fail loudly
    big = {k: np.repeat(np.asarray(v), 8, axis=0)
           for k, v in items[src].items()}
    with pytest.raises(ValueError, match="no exported bucket"):
        exp.convert_features(big, items[ref])


def test_export_with_vocoder_matches_live_interior(tmp_path):
    """The vocoded artifact path edge-pads past the true length before
    synthesis (like Vocoder.decode_batch_device), so exported and live
    waveforms agree away from the receptive-field tail."""
    import jax
    import jax.numpy as jnp

    from tests.test_e2e_pipeline import UTTS
    from serenade_tpu.api import Converter
    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.collaters.ssc import bucket_length
    from serenade_tpu.deploy import export_converter, load
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator

    expdir, stats, items = _tiny_experiment(tmp_path)
    (src, _), (ref, _) = UTTS[:2]
    t_src = items[src]["hubert"].shape[0]
    num_mels = items[src]["logmel"].shape[1]

    # tiny in-framework HiFiGAN checkpoint wired into the experiment config
    gp = dict(in_channels=num_mels, channels=16, upsample_scales=[4, 2],
              upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3],
              resblock_dilations=[[1, 3]], use_additional_convs=True)
    gen = HiFiGANGenerator(
        in_channels=num_mels, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    params = gen.init(jax.random.key(0), jnp.zeros((1, 10, num_mels)))
    save_checkpoint(str(tmp_path / "voc"), 5,
                    {"generator": params, "discriminator": {}})
    with open(tmp_path / "voc.yml", "w") as f:
        yaml.safe_dump(dict(sampling_rate=24000, generator_params=gp), f)
    write_hdf5(str(tmp_path / "voc_stats.h5"), "mean",
               np.zeros(num_mels, np.float32))
    write_hdf5(str(tmp_path / "voc_stats.h5"), "scale",
               np.ones(num_mels, np.float32))
    cfg_path = os.path.join(expdir, "config.yml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["vocoder"] = dict(checkpoint=str(tmp_path / "voc" / "checkpoint-5steps"),
                          config=str(tmp_path / "voc.yml"),
                          stats=str(tmp_path / "voc_stats.h5"))
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    conv = Converter(expdir, stats, n_timesteps=2, seed=3)
    assert conv.vocoder is not None
    ts = bucket_length(t_src)
    tr = bucket_length(items[ref]["hubert"].shape[0])
    art = str(tmp_path / "export_voc")
    manifest = export_converter(conv, art, buckets=((ts, tr),))
    assert manifest["has_vocoder"] and manifest["hop_size"] == 8
    assert manifest["sample_rate"] == 24000

    exp = load(art, seed=3)
    mel_live, wav_live, sr = conv.convert_features(items[src], items[ref])
    mel_exp, wav_exp, sr_e = exp.convert_features(items[src], items[ref])
    assert sr == sr_e == 24000
    assert wav_exp.shape == (t_src * 8,) == wav_live.shape
    np.testing.assert_allclose(mel_exp, mel_live, atol=1e-4, rtol=1e-4)
    # interior samples match; the last ~receptive field differs by the
    # edge-pad-vs-no-pad right context (same deviation class as
    # decode_batch_device, quantified in test_postprocessing bucketing)
    interior = (t_src - 16) * 8
    np.testing.assert_allclose(wav_exp[:interior], wav_live[:interior],
                               atol=1e-3)
    assert np.isfinite(wav_exp).all()


def test_pick_bucket_minimizes_padded_work():
    from serenade_tpu.deploy import ExportedConverter

    exp = ExportedConverter.__new__(ExportedConverter)
    exp.manifest = {"buckets": [[512, 4096], [1024, 512], [2048, 2048]]}
    # a near-exact (1024, 512) fit must beat the lexicographically-smaller
    # (512, 4096) monster: least total packed frames wins
    assert exp._pick_bucket(400, 400) == (1024, 512)
    assert exp._pick_bucket(1500, 1000) == (2048, 2048)
    with pytest.raises(ValueError, match="no exported bucket"):
        exp._pick_bucket(4000, 100)


def test_artifact_server(tmp_path):
    """serenade-serve --artifact: HTTP conversion from the exported
    StableHLO directory alone (no model code / checkpoint / scaler on the
    serving path), with the extraction-dependent endpoints faulting
    clearly."""
    import http.client
    import threading

    from tests.test_e2e_pipeline import UTTS
    from serenade_tpu.api import Converter
    from serenade_tpu.bin.serve import build_app, build_argparser
    from serenade_tpu.collaters.ssc import bucket_length
    from serenade_tpu.deploy import export_converter
    from serenade_tpu.serving import (
        decode_response, encode_reference, encode_request,
    )

    expdir, stats, items = _tiny_experiment(tmp_path)
    (src, _), (ref, _) = UTTS[:2]
    ts = bucket_length(items[src]["hubert"].shape[0])
    tr = bucket_length(items[ref]["hubert"].shape[0])
    # seed 0 matches ArtifactService's default: both key chains start
    # identically, so the first conversion on each side draws the same
    # noise (the export itself consumes no keys)
    conv = Converter(expdir, stats, n_timesteps=2, seed=0)
    art = str(tmp_path / "art")
    export_converter(conv, art, buckets=((ts, tr),))

    args = build_argparser().parse_args(
        ["--artifact", art, "--port", "0"])
    server, service = build_app(args)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/convert_features",
                  body=encode_request(items[src], items[ref]))
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        mel, wav, sr = decode_response(resp.read())
        assert mel.shape[0] == items[src]["hubert"].shape[0]
        assert np.isfinite(mel).all() and wav is None

        # same seed as the live Converter => the first conversions match
        mel_live, _, _ = conv.convert_features(items[src], items[ref])
        np.testing.assert_allclose(mel, mel_live, atol=1e-4, rtol=1e-4)

        # style registration + convert-by-name works artifact-side
        c.request("POST", "/register_reference?name=Breathy",
                  body=encode_reference(items[ref]))
        r = c.getresponse()
        assert r.status == 200
        r.read()
        c.request("POST", "/convert_features",
                  body=encode_request(items[src], "Breathy"))
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        mel2, _, _ = decode_response(resp.read())
        assert mel2.shape == mel.shape and np.isfinite(mel2).all()

        # extraction-dependent endpoints fault with a clear 400
        from serenade_tpu.serving import encode_wav_request

        c.request("POST", "/convert_wav", body=encode_wav_request(
            np.zeros(1000, np.float32), 24000, "Breathy"))
        r = c.getresponse()
        assert r.status == 400 and b"expdir" in r.read()
        c.request("POST", "/convert_stream",
                  body=encode_request(items[src], "Breathy"))
        r = c.getresponse()
        assert r.status == 400 and b"convert_features" in r.read()

        # healthz reports request stats + registered styles
        c.request("GET", "/healthz")
        r = c.getresponse()
        assert r.status == 200
        health = r.read().decode()
        assert "Breathy" in health and '"requests": 2' in health
    finally:
        server.shutdown()
        service.close()

    # CLI arg contract: --artifact excludes/replaces --expdir
    with pytest.raises(SystemExit):
        build_app(build_argparser().parse_args(
            ["--artifact", art, "--expdir", expdir, "--port", "0"]))
    with pytest.raises(SystemExit):
        build_app(build_argparser().parse_args(["--port", "0"]))


def test_export_cli(tmp_path):
    from tests.test_e2e_pipeline import UTTS, _run_cli
    from serenade_tpu.bin.export import main as export_main
    from serenade_tpu.deploy import load

    expdir, stats, items = _tiny_experiment(tmp_path)
    art = str(tmp_path / "artifact")
    _run_cli(export_main, [
        "--expdir", expdir, "--stats", stats, "--out-dir", art,
        "--buckets", "256x256", "--n-timesteps", "2", "--solver", "ab2",
    ])
    exp = load(art)
    assert exp.manifest["solver"] == "ab2"
    (src, _), (ref, _) = UTTS[:2]
    mel, wav, sr = exp.convert_features(items[src], items[ref])
    assert np.isfinite(mel).all() and mel.shape[0] == items[src]["hubert"].shape[0]
