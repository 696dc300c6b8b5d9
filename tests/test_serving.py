"""Request-batching serving layer: correctness, batching, HTTP round trip.

Uses the tiny e2e-trained experiment (same fixtures as test_api.py); the
batching dispatcher must return bit-identical results to the batched API
call and must actually group concurrent requests.
"""

import threading
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_experiment(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serving")
    from tests.test_e2e_pipeline import (
        TINY_CONFIG, UTTS, fake_content_fn, synth_wav, _run_cli,
    )
    import yaml
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
    from serenade_tpu.api import Converter

    conv = Converter(str(tmp_path / "exp"), str(tmp_path / "stats.joblib"),
                     n_timesteps=2)
    conv._paths = (str(tmp_path / "exp"), str(tmp_path / "stats.joblib"))
    return conv, items


def test_convert_features_batch_matches_shapes(tiny_experiment):
    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]
    mels = conv.convert_features_batch([src, src], [ref, ref])
    assert len(mels) == 2
    for mel in mels:
        assert mel.shape[0] == src["hubert"].shape[0]
        assert np.isfinite(mel).all()
    # identical inputs in one batch give different CFM noise draws (z is
    # sampled per batch element), so outputs differ — but both must stay in
    # the same normalized-mel regime
    assert abs(mels[0].mean() - mels[1].mean()) < 2.0


def test_per_request_duration_cap(tiny_experiment):
    """Over-long requests are rejected at submit time (they would pad
    every co-batched neighbor to a giant bucket), on both the feature
    and the raw-audio paths; normal requests still convert."""
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]
    # 1.5 s: above the ~1.2 s fixture utterances, below the synthetic big
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0,
                          max_request_seconds=1.5)
    try:
        t = int(b.max_request_seconds * b._frames_per_sec) + 1
        big = {"hubert": np.zeros((t, src["hubert"].shape[1]), np.float32),
               "score": np.zeros((t, 1), np.float32),
               "loud": np.zeros((t, 1), np.float32)}
        with pytest.raises(ValueError, match="per-request cap"):
            b.convert(big, ref)
        assert b.stats["errors"] == 1

        sr = int(conv.config.get("sampling_rate", 24000))
        with pytest.raises(ValueError, match="per-request cap"):
            b.convert_wav(np.zeros(int(sr * 2.0), np.float32), sr,
                          (np.zeros(sr // 2, np.float32), sr))
        with pytest.raises(ValueError, match="per-request cap"):
            b.register_reference("huge", big | {
                "logmel": np.zeros(
                    (t, np.asarray(
                        conv.scaler["logmel"].mean_).shape[0]),
                    np.float32)})

        mel, _, _ = b.convert(src, ref)  # normal length still converts
        assert mel.shape[0] == src["hubert"].shape[0]
    finally:
        b.close()


def test_batching_converter_groups_requests(tiny_experiment):
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    b = BatchingConverter(conv, max_batch=4, max_wait_ms=200.0)
    try:
        results = [None] * 4
        errors = []

        def call(i):
            try:
                results[i] = b.convert(src, ref)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert all(r is not None for r in results)
        # all four concurrent identical requests served in ONE batch
        assert b.stats["requests"] == 4
        assert b.stats["batches"] == 1, b.stats
        for mel, _, _ in results:
            assert mel.shape[0] == src["hubert"].shape[0]
    finally:
        b.close()


def test_batching_converter_faults_bad_request_alone(tiny_experiment):
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]
    bad = {"hubert": np.zeros((4, 3), np.float32)}  # wrong feature dim

    b = BatchingConverter(conv, max_batch=1, max_wait_ms=1.0)
    try:
        with pytest.raises(Exception):
            b.convert(bad, ref, timeout=60)
        # a request the DISPATCHER itself cannot bucket (missing 'hubert')
        # must fault alone, not kill the dispatcher thread
        with pytest.raises(Exception):
            b.convert({"wrong": np.zeros(3, np.float32)}, ref, timeout=60)
        # malformed ad-hoc reference features reject at SUBMIT time too
        # (they would otherwise collateral-fault the whole batched window)
        with pytest.raises(Exception):
            b.convert(src, {**ref, "logmel": np.zeros((4, 2), np.float32)},
                      timeout=60)
        # server still alive: a good request succeeds afterwards
        mel, _, _ = b.convert(src, ref, timeout=120)
        assert np.isfinite(mel).all()
        assert b.stats["errors"] >= 3
    finally:
        b.close()
    # post-close submits fail fast instead of waiting out their timeout
    with pytest.raises(RuntimeError, match="shutting down"):
        b.convert(src, ref, timeout=60)


def test_registered_reference_styles(tiny_experiment):
    """Named styles are packed once, kept device-resident, and served
    without per-request reference upload; unknown names fail fast."""
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    b = BatchingConverter(conv, max_batch=4, max_wait_ms=100.0)
    try:
        b.register_reference("Breathy", ref)
        assert b.reference_names() == ["Breathy"]
        with pytest.raises(KeyError):
            b.convert(src, "Falsetto", timeout=10)

        results = [None, None]

        def call(i):
            results[i] = b.convert(src, "Breathy", timeout=120)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        assert b.stats["batches"] == 1  # both named-ref requests batched
        mel_named = results[0][0]
        assert mel_named.shape[0] == src["hubert"].shape[0]
        assert np.isfinite(mel_named).all()
        # same conditioning as passing the dict explicitly (shapes/regime)
        mel_dict, _, _ = b.convert(src, ref, timeout=120)
        assert mel_dict.shape == mel_named.shape
    finally:
        b.close()


def test_convert_features_stream(tiny_experiment):
    """Streaming conversion yields ordered finalized segments covering the
    whole source (first audio after one chunk)."""
    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]
    t_src = src["hubert"].shape[0]

    segs = list(conv.convert_features_stream(
        src, ref, chunk_frames=48, overlap_frames=16))
    assert len(segs) >= 2  # actually chunked at this size
    pos = 0
    for start, mel_seg, wav_seg in segs:
        assert start == pos
        assert np.isfinite(mel_seg).all()
        assert wav_seg is None  # tiny config has no vocoder
        pos += mel_seg.shape[0]
    assert pos == t_src


def test_http_round_trip(tiny_experiment):
    import http.client

    from serenade_tpu.serving import (
        BatchingConverter, decode_response, encode_request, make_server,
    )

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    server = make_server(b, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("GET", "/healthz")
        health = c.getresponse()
        assert health.status == 200
        assert b"true" in health.read().lower()

        c.request("POST", "/convert_features", body=encode_request(src, ref))
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        mel, wav, sr = decode_response(resp.read())
        assert mel.shape[0] == src["hubert"].shape[0]
        assert np.isfinite(mel).all()
        assert wav is None  # tiny config has no vocoder checkpoint

        # Prometheus exposition mirrors the JSON stats
        c.request("GET", "/metrics")
        r = c.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type").startswith("text/plain")
        text = r.read().decode()
        assert "# TYPE serenade_requests_total counter" in text
        assert "serenade_requests_total 1" in text
        assert "serenade_registered_references 0" in text

        # malformed body -> 400, server keeps serving (HTTP/1.1 keep-alive:
        # each response body must be drained before the next request)
        c.request("POST", "/convert_features", body=b"not-an-npz")
        r = c.getresponse()
        assert r.status == 400
        r.read()
        c.request("GET", "/healthz")
        r = c.getresponse()
        assert r.status == 200
        r.read()

        # register a style over HTTP, convert by name
        from serenade_tpu.serving import encode_reference

        c.request("POST", "/register_reference?name=Breathy",
                  body=encode_reference(ref))
        r = c.getresponse()
        assert r.status == 200
        r.read()
        c.request("POST", "/convert_features",
                  body=encode_request(src, "Breathy"))
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        mel2, _, _ = decode_response(resp.read())
        assert mel2.shape[0] == src["hubert"].shape[0]
    finally:
        server.shutdown()
        b.close()


def test_group_vocoding_batches_and_trims(tiny_experiment):
    """With a vocoder present, the dispatcher vocodes the whole group in
    ONE batched call and trims each waveform to its true length."""
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    calls = []

    class StubVocoder:
        sampling_rate = 24000

        def decode_batch(self, c):
            calls.append(c.shape)
            return np.zeros((c.shape[0], c.shape[1] * 240), np.float32)

    old = conv.vocoder
    conv.vocoder = StubVocoder()
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=200.0)
    try:
        results = [None, None]

        def call(i):
            results[i] = b.convert(src, ref, timeout=120)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(calls) == 1 and calls[0][0] == 2  # one batched dispatch
        t_src = src["hubert"].shape[0]
        for mel, wav, sr in results:
            assert wav is not None and sr == 24000
            assert wav.shape[0] == t_src * 240  # trimmed to true length
    finally:
        conv.vocoder = old
        b.close()


def test_http_stream_endpoint(tiny_experiment):
    """POST /convert_stream returns chunked length-prefixed npz blocks
    covering the whole source, parseable with iter_stream_blocks."""
    import http.client

    from serenade_tpu.serving import (
        BatchingConverter, encode_request, iter_stream_blocks, make_server,
    )

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    server = make_server(b, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/convert_stream?chunk_frames=48&overlap_frames=16",
                  body=encode_request(src, ref))
        resp = c.getresponse()
        assert resp.status == 200
        blocks = list(iter_stream_blocks(resp))
        assert len(blocks) >= 2  # actually streamed in several blocks
        pos = 0
        for blk in blocks:
            assert int(blk["start"]) == pos
            assert np.isfinite(blk["mel"]).all()
            pos += blk["mel"].shape[0]
        assert pos == src["hubert"].shape[0]

        # registered-style streaming works too
        b.register_reference("S", ref)
        c.request("POST", "/convert_stream?chunk_frames=48&overlap_frames=16",
                  body=encode_request(src, "S"))
        resp = c.getresponse()
        assert resp.status == 200
        total = sum(blk["mel"].shape[0] for blk in iter_stream_blocks(resp))
        assert total == src["hubert"].shape[0]
    finally:
        server.shutdown()
        b.close()


def test_converter_api_serenade_new_variant(tmp_path):
    """The Converter/serving path drives the SerenadeNew (f0_fluc) variant
    end to end — the modded pipeline is servable, not just decodable."""
    import yaml

    from tests.test_e2e_pipeline import (
        TINY_CONFIG, UTTS, fake_content_fn, synth_wav, _run_cli,
    )
    from serenade_tpu.bin.compute_statistics import main as stats_main
    from serenade_tpu.bin.ssc_train_new import main as train_main
    from serenade_tpu.features import FeatureConfig, extract_features
    from serenade_tpu.utils.audio import read_wav
    from serenade_tpu.utils.h5 import write_hdf5

    cfg = dict(TINY_CONFIG)
    cfg.update(model_type="SerenadeNew", trainer_type="SSCTrainerNew",
               collater_type="SSCCollaterNew", dataset_type="FeatsDatasetNew")
    dump = tmp_path / "dump"
    dump.mkdir()
    fc = FeatureConfig.from_dict(cfg)
    items = {}
    for utt, freq in UTTS[:2]:
        wav_path = tmp_path / f"{utt}.wav"
        synth_wav(str(wav_path), freq)
        audio, fs = read_wav(str(wav_path))
        feats = extract_features(utt, audio, fs, fc,
                                 content_fn=fake_content_fn,
                                 with_f0_fluc=True)
        assert "f0_fluc" in feats
        for k, v in feats.items():
            write_hdf5(str(dump / f"{utt}.h5"), k, v)
        feats["score"] = feats["est_lf0_score"]
        items[utt] = feats

    cfg_path = tmp_path / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    _run_cli(stats_main, ["--rootdir", str(dump), "--dumpdir",
                          str(tmp_path), "--config", str(cfg_path)])
    _run_cli(train_main, [
        "--train-dumpdir", str(dump), "--dev-dumpdir", str(dump),
        "--stats", str(tmp_path / "stats.joblib"), "--outdir",
        str(tmp_path / "exp"), "--config", str(cfg_path), "--data-axis", "1",
    ])

    from serenade_tpu.api import Converter
    from serenade_tpu.serving import BatchingConverter

    conv = Converter(str(tmp_path / "exp"), str(tmp_path / "stats.joblib"),
                     n_timesteps=2)
    assert conv.variant_new
    (a, _), (b_utt, _) = UTTS[:2]
    mel, wav, _ = conv.convert_features(items[a], items[b_utt])
    assert mel.shape[0] == items[a]["hubert"].shape[0]
    assert np.isfinite(mel).all()

    bc = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    try:
        bc.register_reference("style", items[b_utt])
        mel2, _, _ = bc.convert(items[a], "style", timeout=120)
        assert mel2.shape == mel.shape and np.isfinite(mel2).all()
    finally:
        bc.close()


def test_converter_data_mesh_matches_single_device(tiny_experiment):
    """data_mesh=8 shards the batched dispatch over the CPU test mesh and
    matches the unsharded result (serve --data-axis on a pod slice);
    non-multiple batch sizes pad and trim transparently."""
    conv_ref, items = tiny_experiment
    expdir, stats = conv_ref._paths  # set by the fixture

    from serenade_tpu.api import Converter

    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    plain = Converter(expdir, stats, n_timesteps=2, seed=7)
    mesh = Converter(expdir, stats, n_timesteps=2, seed=7, data_mesh=8)
    assert mesh.mesh is not None

    mels_plain = plain.convert_features_batch([src] * 8, [ref] * 8)
    mels_mesh = mesh.convert_features_batch([src] * 8, [ref] * 8)
    out = mesh._infer  # noqa: F841
    for a, b in zip(mels_plain, mels_mesh):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)

    # batch of 3 pads to 8 internally and trims back
    mels3 = mesh.convert_features_batch([src] * 3, [ref] * 3)
    assert len(mels3) == 3
    for m in mels3:
        assert m.shape[0] == src["hubert"].shape[0]
        assert np.isfinite(m).all()


def test_dispatcher_device_tail_on_mesh(tiny_experiment, tmp_path):
    """With data_mesh set AND a real vocoder, the dispatcher keeps the
    device-resident tail (mel never re-uploaded, int16 fetch) by placing
    the generator params on the mesh — previously mesh serving fell back
    to the host vocoder path."""
    import jax
    import jax.numpy as jnp
    import yaml

    from serenade_tpu.api import Converter
    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.serving import BatchingConverter
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator
    from serenade_tpu.vocoder.vocoder import Vocoder

    conv_ref, items = tiny_experiment
    expdir, stats = conv_ref._paths
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    n_mels = src["logmel"].shape[1]
    gp = dict(in_channels=n_mels, channels=16, upsample_scales=[4, 2],
              upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3],
              resblock_dilations=[[1, 3]], use_additional_convs=True)
    gen = HiFiGANGenerator(
        in_channels=n_mels, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    params = gen.init(jax.random.key(0), jnp.zeros((1, 10, n_mels)))
    save_checkpoint(str(tmp_path / "voc"), 5,
                    {"generator": params, "discriminator": {}})
    cfg_path = tmp_path / "voc.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(dict(sampling_rate=24000, generator_params=gp), f)
    stats_path = str(tmp_path / "stats.h5")
    write_hdf5(stats_path, "mean", np.zeros(n_mels, np.float32))
    write_hdf5(stats_path, "scale", np.ones(n_mels, np.float32))

    conv = Converter(expdir, stats, n_timesteps=2, seed=7, data_mesh=8)
    conv.vocoder = Vocoder(str(tmp_path / "voc" / "checkpoint-5steps"),
                           str(cfg_path), stats_path, take_norm_feat=False)

    # prove the DEVICE tail is taken: the host path would call
    # decode_batch, which we make explode
    def boom(*a, **k):
        raise AssertionError("host vocoder path used under mesh")

    conv.vocoder.decode_batch = boom

    bc = BatchingConverter(conv, max_batch=2, max_wait_ms=50.0)
    try:
        mel, wav, sr = bc.convert(src, ref, timeout=300)
        assert sr == 24000
        assert mel.shape[0] == src["hubert"].shape[0]
        assert wav is not None and wav.shape[0] == mel.shape[0] * 8
        assert np.isfinite(wav).all()
        assert getattr(conv.vocoder, "_mesh", None) is not None
    finally:
        bc.close()


def test_stream_vocodes_segments_with_context(tiny_experiment):
    """Streaming with a vocoder: each finalized mel segment is vocoded
    with left context and trimmed, so concatenated wav segments cover
    exactly the source."""
    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]
    t_src = src["hubert"].shape[0]

    class StubVocoder:
        sampling_rate = 24000

        def decode(self, mel):
            # wav sample i encodes its frame index (hop=4 for testability)
            return np.repeat(np.arange(mel.shape[0], dtype=np.float32), 4), 24000

    old = conv.vocoder
    conv.vocoder = StubVocoder()
    try:
        segs = list(conv.convert_features_stream(
            src, ref, chunk_frames=48, overlap_frames=16,
            vocoder_context_frames=8))
        assert len(segs) >= 2
        assert conv.output_sample_rate == 24000
        total = 0
        for start, mel_seg, wav_seg in segs:
            assert wav_seg is not None
            assert wav_seg.shape[0] == mel_seg.shape[0] * 4  # ctx trimmed
            # the first emitted sample corresponds to this segment's start
            # RELATIVE to its vocoder input (context frames come first)
            total += mel_seg.shape[0]
        assert total == t_src
    finally:
        conv.vocoder = old


def test_serve_cli_build_app(tiny_experiment):
    """The real serve CLI assembly: parse args, preload a ref-dict style,
    serve a named conversion over HTTP on an ephemeral port."""
    import http.client
    import json

    from serenade_tpu.bin.serve import build_app, build_argparser
    from serenade_tpu.serving import decode_response, encode_request

    conv, items = tiny_experiment
    expdir, stats = conv._paths
    keys = list(items)
    src = items[keys[0]]

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # the ref-dict points at an h5 dump; reuse the fixture's dump dir
        dump_h5 = f"{expdir}/../dump/{keys[1]}.h5"
        rd = f"{td}/refstyles.json"
        with open(rd, "w") as f:
            json.dump({"Breathy": dump_h5}, f)

        args = build_argparser().parse_args([
            "--expdir", expdir, "--stats", stats, "--ref-dict", rd,
            "--port", "0", "--n-timesteps", "2", "--max-wait-ms", "5",
            "--warmup", "64:64:2",
        ])
        server, batching = build_app(args)
        try:
            assert batching.reference_names() == ["Breathy"]
            # --warmup drove 2 synthetic conversions through the
            # dispatcher before the server was built (a failure would
            # have raised), then restored the stats so the warmup's
            # compile time can't wreck the /metrics rtf on a fresh deploy
            assert batching.stats["requests"] == 0
            assert batching.stats["compute_sec"] == 0.0
            port = server.server_address[1]
            threading.Thread(target=server.serve_forever,
                             daemon=True).start()
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            c.request("POST", "/convert_features",
                      body=encode_request(src, "Breathy"))
            resp = c.getresponse()
            assert resp.status == 200, resp.read()
            mel, _, _ = decode_response(resp.read())
            assert mel.shape[0] == src["hubert"].shape[0]
        finally:
            server.shutdown()
            batching.close()


def test_concurrent_mixed_length_stress(tiny_experiment):
    """12 concurrent requests with three different source lengths: every
    request completes, groups form per bucket, results have the right
    per-request lengths."""
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    base, ref = items[keys[0]], items[keys[1]]

    def clipped(n):
        return {k: np.asarray(v)[:n] for k, v in base.items()}

    t_full = base["hubert"].shape[0]
    lengths = [t_full, t_full // 2, t_full // 3]
    srcs = [clipped(lengths[i % 3]) for i in range(12)]

    b = BatchingConverter(conv, max_batch=6, max_wait_ms=150.0)
    try:
        b.register_reference("S", ref)
        results = [None] * 12

        def call(i):
            results[i] = b.convert(srcs[i], "S", timeout=180)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert all(r is not None for r in results)
        for i, (mel, _, _) in enumerate(results):
            assert mel.shape[0] == srcs[i]["hubert"].shape[0]
            assert np.isfinite(mel).all()
        assert b.stats["requests"] == 12
        assert b.stats["errors"] == 0
        # batching really happened (far fewer dispatches than requests)
        assert b.stats["batches"] <= 8, b.stats
    finally:
        b.close()


def test_stream_terminal_markers():
    """The stream wire format ends with {done} or {error}; a stream that
    just stops is reported as truncated instead of parsing as complete
    (a mid-flight failure used to emit the normal chunked terminator)."""
    import io

    import pytest

    from serenade_tpu.serving import _frame_block, iter_stream_blocks

    seg = {"start": np.int64(0), "mel": np.zeros((4, 8), np.float32)}

    ok = _frame_block(seg) + _frame_block({"done": np.int64(1)})
    blocks = list(iter_stream_blocks(io.BytesIO(ok)))
    assert len(blocks) == 1 and blocks[0]["mel"].shape == (4, 8)

    err = _frame_block(seg) + _frame_block({"error": np.asarray("boom")})
    it = iter_stream_blocks(io.BytesIO(err))
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)

    truncated = _frame_block(seg)  # no marker: connection died
    it = iter_stream_blocks(io.BytesIO(truncated))
    next(it)
    with pytest.raises(RuntimeError, match="truncated"):
        next(it)
    # lenient mode (strict=False) keeps the old stop-at-EOF behavior
    assert len(list(iter_stream_blocks(io.BytesIO(truncated),
                                       strict=False))) == 1


def test_register_reference_cap(tiny_experiment):
    """The style registry is bounded: registrations beyond max_references
    fail instead of pinning unbounded device memory; re-registering an
    existing name always succeeds."""
    import pytest

    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    ref = items[list(items)[1]]
    b = BatchingConverter(conv, max_wait_ms=1.0, max_references=2)
    try:
        b.register_reference("A", ref)
        b.register_reference("B", ref)
        with pytest.raises(ValueError, match="registry full"):
            b.register_reference("C", ref)
        b.register_reference("A", ref)  # overwrite is fine
        assert b.reference_names() == ["A", "B"]
    finally:
        b.close()


def test_http_body_size_cap(tiny_experiment):
    """POST bodies beyond max_body_bytes are rejected with 413 before the
    server reads them."""
    import http.client

    from serenade_tpu.serving import (
        BatchingConverter, encode_request, make_server,
    )

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    b = BatchingConverter(conv, max_wait_ms=1.0)
    server = make_server(b, host="127.0.0.1", port=0, max_body_bytes=1024)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = encode_request(src, ref)
        assert len(body) > 1024
        for path in ("/convert_features", "/convert_stream",
                     "/register_reference?name=X"):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            c.request("POST", path, body=body)
            resp = c.getresponse()
            assert resp.status == 413, (path, resp.status)
            resp.read()
            c.close()
    finally:
        server.shutdown()
        b.close()


def test_close_faults_queued_requests_on_stuck_dispatcher(tiny_experiment):
    """If the dispatcher outlives close()'s join (e.g. a minutes-long first
    compile), close() itself drains the queue so blocked callers fault
    immediately instead of waiting out their full submit timeout."""
    import time as _time

    from serenade_tpu.serving import BatchingConverter, _Request

    conv, _ = tiny_experiment
    b = BatchingConverter(conv, max_wait_ms=1.0)
    # simulate a stuck in-flight dispatch: occupy the dispatcher thread
    release = threading.Event()
    orig_run = b._run_group

    def slow_run(reqs, ts, tr):
        release.wait(30.0)
        orig_run(reqs, ts, tr)

    b._run_group = slow_run
    stuck = _Request(src={"hubert": np.zeros((4, 8), np.float32)}, ref="X")
    b._queue.put(stuck)  # enters slow_run via the dispatch loop
    _time.sleep(0.3)
    queued = _Request(src={"hubert": np.zeros((4, 8), np.float32)}, ref="X")
    b._queue.put(queued)  # still in the queue when close() gives up
    t0 = _time.monotonic()
    b.close(join_timeout=0.5)
    assert _time.monotonic() - t0 < 5.0
    assert queued.done.is_set()
    assert isinstance(queued.error, RuntimeError)
    release.set()


def test_convert_wav_endpoint(tiny_experiment, tmp_path):
    """POST /convert_wav: raw audio in (RIFF + ?style= or npz with an
    ad-hoc reference wav), wav/mel out — features are extracted on the
    server, so the wire payload is ~48x smaller than /convert_features."""
    import http.client
    import io as _io

    from tests.test_e2e_pipeline import fake_content_fn, synth_wav
    from serenade_tpu.serving import (
        BatchingConverter, encode_wav_request, make_server,
    )
    from serenade_tpu.utils.audio import read_wav

    conv, items = tiny_experiment
    src_path, ref_path = tmp_path / "s.wav", tmp_path / "r.wav"
    synth_wav(str(src_path), 220.0)
    synth_wav(str(ref_path), 330.0)
    src_wav, sr = read_wav(str(src_path))
    ref_wav, _ = read_wav(str(ref_path))

    old_content = conv._content_fn
    conv._content_fn = fake_content_fn
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    server = make_server(b, host="127.0.0.1", port=0,
                         f0_table={"Tenor": {"minf0": 130,
                                             "maxf0": 440}})
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # npz body with an ad-hoc reference waveform
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        c.request("POST", "/convert_wav",
                  body=encode_wav_request(src_wav, sr, (ref_wav, sr)))
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        body = resp.read()
        with np.load(_io.BytesIO(body)) as z:  # no vocoder -> npz mel
            mel = z["mel"]
        assert np.isfinite(mel).all() and mel.shape[0] > 0

        # RIFF body + registered style (feature dict registered as usual)
        ref_feats = conv.extract_from_wav(ref_wav, sr, "ref")
        b.register_reference("Breathy", ref_feats)
        c.request("POST", "/convert_wav?style=Breathy",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        with np.load(_io.BytesIO(resp.read())) as z:
            mel2 = z["mel"]
        assert mel2.shape == mel.shape

        # RIFF body without a style is a clean 400
        c.request("POST", "/convert_wav", body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 400
        resp.read()

        # per-request F0 search range (the reference's per-voice-type
        # ranges, conf/f0.yaml): query params on a RIFF body...
        c.request("POST", "/convert_wav?style=Breathy&f0_min=150&f0_max=600",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        resp.read()
        # ...npz keys via the client helper...
        c.request("POST", "/convert_wav",
                  body=encode_wav_request(src_wav, sr, (ref_wav, sr),
                                          f0_range=(150.0, 600.0)))
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        resp.read()
        # ...voice_type resolved through the server's --f0-table...
        c.request("POST", "/convert_wav?style=Breathy&voice_type=Tenor",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        resp.read()
        c.request("POST", "/convert_wav?style=Breathy&voice_type=Whale",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 400
        assert b"voice_type" in resp.read()
        # ...and a nonsensical range is a clean 400
        c.request("POST", "/convert_wav?style=Breathy&f0_min=500&f0_max=100",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 400
        assert b"f0_range" in resp.read()
    finally:
        server.shutdown()
        b.close()
        conv._content_fn = old_content


def test_convert_wav_returns_riff_with_vocoder(tiny_experiment, tmp_path):
    """With a vocoder loaded the endpoint answers audio/wav RIFF bytes."""
    import http.client

    from tests.test_e2e_pipeline import fake_content_fn, synth_wav
    from serenade_tpu.serving import BatchingConverter, make_server
    from serenade_tpu.utils.audio import read_wav

    conv, _ = tiny_experiment
    synth_wav(str(tmp_path / "s.wav"), 220.0)
    src_wav, sr = read_wav(str(tmp_path / "s.wav"))

    class StubVocoder:
        sampling_rate = 24000

        def decode_batch(self, c):
            return np.zeros((c.shape[0], c.shape[1] * 240), np.float32)

    old_content, old_voc = conv._content_fn, conv.vocoder
    conv._content_fn = fake_content_fn
    conv.vocoder = StubVocoder()
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    server = make_server(b, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        ref_feats = conv.extract_from_wav(src_wav, sr, "ref")
        b.register_reference("S", ref_feats)
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        c.request("POST", "/convert_wav?style=S",
                  body=(tmp_path / "s.wav").read_bytes())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        assert resp.getheader("Content-Type") == "audio/wav"
        body = resp.read()
        assert body[:4] == b"RIFF"
        import io as _io

        y, out_sr = read_wav(_io.BytesIO(body))
        assert out_sr == 24000 and len(y) > 0
    finally:
        server.shutdown()
        b.close()
        conv._content_fn, conv.vocoder = old_content, old_voc


def test_raw_requests_batch_extraction(tiny_experiment, tmp_path):
    """Concurrent raw-audio requests must share BATCHED extraction calls
    (the dispatcher materializes the whole pending window at once) and
    still convert correctly; a corrupt waveform faults alone."""
    from tests.test_e2e_pipeline import fake_content_fn, synth_wav
    from serenade_tpu.serving import BatchingConverter
    from serenade_tpu.utils.audio import read_wav

    conv, _ = tiny_experiment
    synth_wav(str(tmp_path / "s.wav"), 220.0)
    synth_wav(str(tmp_path / "r.wav"), 330.0)
    src_wav, sr = read_wav(str(tmp_path / "s.wav"))
    ref_wav, _ = read_wav(str(tmp_path / "r.wav"))

    old_content = conv._content_fn
    conv._content_fn = fake_content_fn
    calls = []
    orig_batch = conv.extract_from_wav_batch

    def counting_batch(wavs, srs, f0_ranges=None):
        calls.append(len(wavs))
        return orig_batch(wavs, srs, f0_ranges=f0_ranges)

    conv.extract_from_wav_batch = counting_batch
    b = BatchingConverter(conv, max_batch=8, max_wait_ms=300.0)
    try:
        b.register_reference("S", conv.extract_from_wav(ref_wav, sr, "ref"))
        results = [None] * 4

        def call(i):
            results[i] = b.convert_wav(src_wav, sr, "S", timeout=180)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert all(r is not None for r in results)
        for mel, _, _ in results:
            assert np.isfinite(mel).all()
        # the 4 concurrent raw requests extracted in ONE batched call
        assert calls and max(calls) >= 4, calls
    finally:
        conv.extract_from_wav_batch = orig_batch
        conv._content_fn = old_content
        b.close()


def test_bad_raw_waveform_faults_alone(tiny_experiment, tmp_path):
    """Malformed raw-audio submits fault at enqueue with a precise message
    (eager validation) and never join a batched extraction window, so
    concurrent valid requests are untouched."""
    import pytest

    from tests.test_e2e_pipeline import fake_content_fn, synth_wav
    from serenade_tpu.serving import BatchingConverter
    from serenade_tpu.utils.audio import read_wav

    conv, _ = tiny_experiment
    synth_wav(str(tmp_path / "s.wav"), 220.0)
    synth_wav(str(tmp_path / "r.wav"), 330.0)
    src_wav, sr = read_wav(str(tmp_path / "s.wav"))
    ref_wav, _ = read_wav(str(tmp_path / "r.wav"))

    old_content = conv._content_fn
    conv._content_fn = fake_content_fn
    b = BatchingConverter(conv, max_batch=4, max_wait_ms=200.0)
    try:
        b.register_reference("S", conv.extract_from_wav(ref_wav, sr, "ref"))
        with pytest.raises(ValueError, match="not normalized"):
            b.convert_wav((3.0 * src_wav).astype(np.float32), sr, "S")
        nan = src_wav.copy()
        nan[5] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            b.convert_wav(nan, sr, "S")
        with pytest.raises(ValueError, match="empty"):
            b.convert_wav(np.zeros(0, np.float32), sr, "S")

        # bad submits racing good ones: the good requests all convert
        results, errors = [None, None], [None]

        def good(i):
            results[i] = b.convert_wav(src_wav, sr, "S", timeout=180)

        def bad():
            try:
                b.convert_wav(nan, sr, "S", timeout=180)
            except ValueError as e:
                errors[0] = e

        threads = [threading.Thread(target=good, args=(0,)),
                   threading.Thread(target=bad),
                   threading.Thread(target=good, args=(1,))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert isinstance(errors[0], ValueError)
        for mel, _, _ in results:
            assert mel is not None and np.isfinite(mel).all()
    finally:
        conv._content_fn = old_content
        b.close()


def test_http_stream_raw_audio(tiny_experiment, tmp_path):
    """/convert_stream accepts RAW AUDIO bodies (RIFF + ?style= or npz
    src_wav [+ ref_wav]): features extract on the server and the long-form
    stream runs with the same transfer-light wire as /convert_wav."""
    import http.client
    import io as _io

    from tests.test_e2e_pipeline import fake_content_fn, synth_wav
    from serenade_tpu.serving import (
        BatchingConverter, iter_stream_blocks, make_server,
    )
    from serenade_tpu.utils.audio import read_wav

    conv, items = tiny_experiment
    src_path, ref_path = tmp_path / "s.wav", tmp_path / "r.wav"
    synth_wav(str(src_path), 220.0)
    synth_wav(str(ref_path), 330.0)
    src_wav, sr = read_wav(str(src_path))
    ref_wav, _ = read_wav(str(ref_path))

    old_content = conv._content_fn
    conv._content_fn = fake_content_fn
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    server = make_server(b, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        n_frames = conv.extract_from_wav(src_wav, sr, "src")["hubert"].shape[0]
        # the windowed default streams stream_total_frames (the REAL
        # ContentVec frame contract); fake_content_fn emits len16//160
        # frames, so the full-extraction min length differs slightly
        from serenade_tpu.features import (
            FeatureConfig, _prepare_audio, stream_total_frames,
        )

        fc = FeatureConfig.from_dict(conv.config)
        n_windowed = stream_total_frames(
            len(_prepare_audio("s", src_wav, sr, fc)), fc)

        # RIFF + registered style (windowed extraction default)
        b.register_reference("S", conv.extract_from_wav(ref_wav, sr, "ref"))
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        c.request("POST",
                  "/convert_stream?style=S&chunk_frames=48&overlap_frames=16"
                  "&first_chunk_frames=32&extract_ctx_frames=32",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        blocks = list(iter_stream_blocks(resp))
        assert len(blocks) >= 2
        assert sum(blk["mel"].shape[0] for blk in blocks) == n_windowed

        # npz raw body with an ad-hoc reference waveform
        buf = _io.BytesIO()
        np.savez(buf, src_wav=src_wav, sr=np.int64(sr),
                 ref_wav=ref_wav, ref_sr=np.int64(sr))
        c.request("POST", "/convert_stream?chunk_frames=48&overlap_frames=16",
                  body=buf.getvalue())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        total = sum(blk["mel"].shape[0]
                    for blk in iter_stream_blocks(resp))
        assert total == n_windowed

        # ?windowed=0 keeps the legacy full-extraction path (and its
        # full-path frame count)
        c.request("POST",
                  "/convert_stream?style=S&windowed=0"
                  "&chunk_frames=48&overlap_frames=16",
                  body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 200, resp.read()
        total = sum(blk["mel"].shape[0]
                    for blk in iter_stream_blocks(resp))
        assert total == n_frames

        # RIFF without a style is a clean 400, connection stays usable
        c.request("POST", "/convert_stream", body=src_path.read_bytes())
        resp = c.getresponse()
        assert resp.status == 400
        resp.read()
    finally:
        server.shutdown()
        b.close()
        conv._content_fn = old_content


def test_busy_hold_coalesces_requests(tiny_experiment):
    """While a launched batch is in flight, the dispatcher holds its next
    window open past max_wait (waiting is free when the chip is busy), so
    requests arriving during the in-flight batch coalesce into ONE full
    window instead of dribbling out in singles."""
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    b = BatchingConverter(conv, max_batch=4, max_wait_ms=5.0,
                          busy_hold_ms=10000.0)
    try:
        # pin the pipeline "busy": a fake in-flight batch whose finish
        # blocks until we release it
        gate = threading.Event()
        with b._lock:
            b._inflight += 1
        b._completions.put(([], gate.wait))

        results = [None] * 4
        done = []

        def call(i):
            results[i] = b.convert(src, ref, timeout=120)
            done.append(i)

        threads = []
        base = dict(b.stats)
        for i in range(4):
            t = threading.Thread(target=call, args=(i,))
            t.start()
            threads.append(t)
            time.sleep(0.08)  # arrivals 80 ms apart >> max_wait 5 ms
        assert b.stats["batches"] == base["batches"]  # nothing dispatched
        gate.set()  # pipeline idle -> window closes
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        assert b.stats["batches"] == base["batches"] + 1, b.stats
        assert b.stats["requests"] == base["requests"] + 4
    finally:
        b.close()


def test_close_during_inflight_never_orphans(tiny_experiment):
    """Shutdown racing an in-flight overlapped batch: every submitted
    request must resolve promptly (result or 'shutting down' error) —
    the finisher may not exit while the dispatcher still holds a window
    it has yet to launch (the orphan class of the launch/fetch split)."""
    from serenade_tpu.serving import BatchingConverter

    conv, items = tiny_experiment
    keys = list(items)
    src, ref = items[keys[0]], items[keys[1]]

    for round_i in range(3):  # a few shutdown timings
        b = BatchingConverter(conv, max_batch=4, max_wait_ms=5.0)
        outcomes = [None] * 3

        def call(i):
            try:
                outcomes[i] = ("ok", b.convert(src, ref, timeout=30))
            except Exception as e:  # noqa: BLE001
                outcomes[i] = ("err", e)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        time.sleep(0.02 * round_i)  # vary where close() lands
        b.close()
        for t in threads:
            t.join(timeout=60)
        assert all(not t.is_alive() for t in threads), (
            f"round {round_i}: a caller hung through close()")
        for i, out in enumerate(outcomes):
            assert out is not None, (round_i, i, "no outcome")


def test_http_live_duplex_stream(tiny_experiment):
    """/convert_stream_live converts WHILE the client is still uploading:
    over one socket, PCM16 chunks go up and converted blocks come back
    before the request body is finished (true duplex live conversion)."""
    import socket

    from tests.test_e2e_pipeline import fake_content_fn
    from tests.test_stream_windowed import _synth_notes
    from serenade_tpu.features import (
        FeatureConfig, stream_total_frames,
    )
    from serenade_tpu.serving import BatchingConverter, make_server

    conv, items = tiny_experiment
    old_content = conv._content_fn
    conv._content_fn = fake_content_fn
    b = BatchingConverter(conv, max_batch=2, max_wait_ms=5.0)
    server = make_server(b, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        b.register_reference("S", items[list(items)[0]])
        wav = _synth_notes(3.0)
        pcm = np.clip(np.round(wav * 32768.0), -32768,
                      32767).astype("<i2").tobytes()
        fc = FeatureConfig.from_dict(conv.config)
        n_expected = stream_total_frames(len(wav) + fc.fft_size, fc)

        s = socket.create_connection(("127.0.0.1", port), timeout=300)
        s.sendall(
            b"POST /convert_stream_live?style=S&sr=24000&chunk_frames=64"
            b"&overlap_frames=16&extract_ctx_frames=16 HTTP/1.1\r\n"
            b"Host: x\r\nTransfer-Encoding: chunked\r\n\r\n")

        received = bytearray()
        done_reading = threading.Event()

        def reader():
            while True:
                try:
                    data = s.recv(65536)
                except OSError:
                    break
                if not data:
                    break
                received.extend(data)
            done_reading.set()

        rt = threading.Thread(target=reader, daemon=True)
        rt.start()

        def send_piece(data):
            s.sendall(f"{len(data):X}\r\n".encode() + data + b"\r\n")

        # upload the first ~40% (covers several 64-frame spans), then
        # WAIT for response bytes before sending the rest — proof the
        # server converts while the body is still open
        cut = (len(pcm) * 2 // 5) & ~1
        for lo in range(0, cut, 16384):
            send_piece(pcm[lo:min(lo + 16384, cut)])
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            if b"\r\n\r\n" in received and received.rstrip() \
                    and len(received) > 400:
                break
            time.sleep(0.05)
        head_end = bytes(received).find(b"\r\n\r\n")
        assert head_end > 0, "no response headers while uploading"
        assert bytes(received).startswith(b"HTTP/1.1 200"), received[:80]
        assert len(received) > head_end + 10, (
            "no converted blocks arrived before the upload finished")

        for lo in range(cut, len(pcm), 16384):
            send_piece(pcm[lo:lo + 16384])
        s.sendall(b"0\r\n\r\n")
        # keep-alive connection: the server doesn't close after the
        # response — wait for the chunked terminator instead of EOF
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            if bytes(received).endswith(b"0\r\n\r\n"):
                break
            time.sleep(0.05)
        assert bytes(received).endswith(b"0\r\n\r\n"), (
            "response never completed")
        s.close()
        done_reading.wait(30)

        # de-chunk the HTTP framing, then parse the block wire
        body = bytes(received)[head_end + 4:]
        payload = b""
        i = 0
        while True:
            j = body.index(b"\r\n", i)
            size = int(body[i:j], 16)
            if size == 0:
                break
            payload += body[j + 2:j + 2 + size]
            i = j + 2 + size + 2
        import io as _io

        from serenade_tpu.serving import iter_stream_blocks

        blocks = list(iter_stream_blocks(_io.BytesIO(payload + b"x")))
        assert blocks, "no stream blocks"
        total = sum(blk["mel"].shape[0] for blk in blocks)
        assert total == n_expected
        starts = [int(blk["start"]) for blk in blocks]
        assert starts[0] == 0 and starts == sorted(starts)
    finally:
        server.shutdown()
        b.close()
        conv._content_fn = old_content
