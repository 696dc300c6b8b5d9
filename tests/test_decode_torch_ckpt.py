"""Decode CLI with a torch .pkl checkpoint: exercises the on-the-fly
converter + frozen-BatchNorm GST override through the real CLI path."""

import os
import sys

import numpy as np
import pytest
import yaml

from serenade_tpu.utils.h5 import read_hdf5, write_hdf5
from tests.test_serenade_convert import (
    IN_DIM, MEL, ENC_CH, DEC_CH, GST_DIM, HEAD_DIM, GST_CHANS, GRU_UNITS,
    _build_torch_twin,
)


def test_decode_cli_with_torch_pkl(tmp_path):
    torch = pytest.importorskip("torch")
    from serenade_tpu.bin.ssc_decode import main as decode_main

    twin = _build_torch_twin()
    ckpt_path = tmp_path / "checkpoint-200000steps.pkl"
    torch.save({"model": twin.state_dict()}, str(ckpt_path))

    # tiny dump matching the twin's dims
    rng = np.random.default_rng(0)
    dump = tmp_path / "dump"
    dump.mkdir()
    T = 80
    for utt in ("EN_s1_a_Breathy_Group_0", "EN_s1_b_Falsetto_Group_0"):
        h5 = str(dump / f"{utt}.h5")
        write_hdf5(h5, "wave", rng.normal(size=T * 240).astype(np.float32) * 0.1)
        write_hdf5(h5, "hubert", rng.normal(size=(T, IN_DIM)).astype(np.float32))
        write_hdf5(h5, "logmel", rng.normal(size=(T, MEL)).astype(np.float32))
        write_hdf5(h5, "loud", rng.normal(size=(T, 1)).astype(np.float32))
        write_hdf5(h5, "est_lf0_score", rng.normal(size=(T, 1)).astype(np.float32))
        write_hdf5(h5, "midi", rng.normal(size=(T, 1)).astype(np.float32))
        f0 = np.zeros((T, 1), np.float32)
        f0[10:60] = 220.0
        write_hdf5(h5, "f0", f0)

    # scaler over the dump
    import joblib

    from serenade_tpu.utils.scalers import MinMaxScaler, StandardScaler

    scaler = {"hubert": StandardScaler(), "logmel": StandardScaler(),
              "score": MinMaxScaler(), "loud": MinMaxScaler()}
    for utt in os.listdir(dump):
        path = str(dump / utt)
        scaler["hubert"].partial_fit(read_hdf5(path, "hubert"))
        scaler["logmel"].partial_fit(read_hdf5(path, "logmel"))
        scaler["score"].partial_fit(read_hdf5(path, "est_lf0_score"))
        scaler["loud"].partial_fit(read_hdf5(path, "loud"))
    stats = str(tmp_path / "stats.joblib")
    joblib.dump(scaler, stats)

    cfg = tmp_path / "config.yml"
    with open(cfg, "w") as f:
        yaml.safe_dump(dict(
            sampling_rate=24000,
            model_type="Serenade",
            model_params=dict(
                input_dim=IN_DIM, output_dim=MEL, encoder_channels=ENC_CH,
                encoder_hidden_dim=24,
                gst_tokens=10, gst_conv_chans=list(GST_CHANS),
                gst_gru_units=GRU_UNITS,
                decoder_channels=DEC_CH, gst_embed_dim=GST_DIM,
                decoder_attention_head_dim=HEAD_DIM, dtype="float32",
            ),
        ), f)

    outdir = str(tmp_path / "decoded")
    old = sys.argv
    sys.argv = ["prog", "--dumpdir", str(dump), "--stats", stats,
                "--outdir", outdir, "--checkpoint", str(ckpt_path),
                "--config", str(cfg), "--n-timesteps", "2"]
    try:
        decode_main()
    finally:
        sys.argv = old

    outs = [f for f in os.listdir(outdir) if f.endswith(".h5")]
    assert outs, "no conversions produced from the torch checkpoint"
    mel = read_hdf5(os.path.join(outdir, outs[0]), "mel")
    assert mel is not None and mel.shape[1] == MEL
    assert np.isfinite(mel).all()
