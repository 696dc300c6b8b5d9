"""SiFiGAN torch-checkpoint conversion parity (twin → flax, ≤5e-4).

The released SiFiGAN checkpoint can't be fetched in this environment, so
parity is proven against the in-repo torch twin (official module naming +
weight norm, sifigan/torch_twin.py) saved in the official trainer layout
``{"model": {"generator": sd}}`` — the same pickle shape
serenade/bin/ssc_postprocessing.py:92-99 loads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from serenade_tpu.sifigan import SiFiGANGenerator
from serenade_tpu.sifigan.convert import load_sifigan_checkpoint
from serenade_tpu.sifigan.torch_twin import SiFiGANGeneratorTorch

SMALL = dict(
    in_channels=7,
    channels=32,
    kernel_size=7,
    upsample_scales=(4, 3, 2),
    upsample_kernel_sizes=(8, 6, 4),
    source_resblock_dilations=((1,), (1, 2), (1, 2, 4)),
    filter_resblock_kernel_sizes=(3, 5),
    filter_resblock_dilations=((1, 3), (1, 3)),
)
SMALL_TORCH = dict(
    in_channels=7,
    channels=32,
    kernel_size=7,
    upsample_scales=(4, 3, 2),
    upsample_kernel_sizes=(8, 6, 4),
    source_network_params={
        "resblock_kernel_size": 3,
        "resblock_dilations": [(1,), (1, 2), (1, 2, 4)],
        "use_additional_convs": True,
    },
    filter_network_params={
        "resblock_kernel_sizes": (3, 5),
        "resblock_dilations": [(1, 3), (1, 3)],
        "use_additional_convs": False,
    },
)


def _example(seed=0, tf=16, scales=(4, 3, 2), in_channels=7):
    rng = np.random.default_rng(seed)
    total = int(np.prod(scales))
    c = rng.normal(size=(1, tf, in_channels)).astype(np.float32)
    sine = (0.1 * np.sin(np.linspace(0, 60, tf * total))).astype(
        np.float32)[None, :, None]
    dfs, cum = [], 1
    for s in scales:
        cum *= s
        # realistic dilation factors in [1, 4] with variation
        d = 1.0 + 3.0 * rng.random(tf * cum).astype(np.float32)
        dfs.append(d[None, :])
    return sine, c, dfs


@pytest.mark.parametrize("share", [False, True])
def test_twin_checkpoint_roundtrip_parity(tmp_path, share):
    torch.manual_seed(0)
    twin = SiFiGANGeneratorTorch(
        **SMALL_TORCH, share_upsamples=share, share_downsamples=share,
        use_weight_norm=True,
    )
    twin.eval()

    path = tmp_path / "sifigan.pkl"
    torch.save({"model": {"generator": twin.state_dict()}}, path)

    model = SiFiGANGenerator(
        **SMALL, share_upsamples=share, share_downsamples=share)
    variables = load_sifigan_checkpoint(str(path), model)

    sine, c, dfs = _example()
    with torch.no_grad():
        y_t, e_t = twin(
            torch.from_numpy(np.transpose(sine, (0, 2, 1))),
            torch.from_numpy(np.transpose(c, (0, 2, 1))),
            [torch.from_numpy(d[:, None, :]) for d in dfs],
        )
    y_j, e_j = jax.jit(model.apply)(
        variables, jnp.asarray(sine), jnp.asarray(c),
        [jnp.asarray(d) for d in dfs],
    )

    np.testing.assert_allclose(
        np.asarray(y_j)[:, :, 0], y_t.numpy()[:, 0, :], atol=5e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(e_j)[:, :, 0], e_t.numpy()[:, 0, :], atol=5e-4, rtol=0)


@pytest.mark.parametrize("share_up", [False, True])
def test_direct_twin_checkpoint_roundtrip_parity(tmp_path, share_up):
    """SiFi-GAN Direct (sifigan.direct.yaml's _target_): the filter
    network conditions on the re-embedded excitation SIGNAL (fn.emb +
    its own downsamples) — converted checkpoints must reproduce the
    torch twin ≤5e-4 like the main variant."""
    from serenade_tpu.sifigan import SiFiGANDirectGenerator
    from serenade_tpu.sifigan.torch_twin import SiFiGANDirectGeneratorTorch

    torch.manual_seed(3)
    twin = SiFiGANDirectGeneratorTorch(
        **SMALL_TORCH, share_upsamples=share_up, use_weight_norm=True)
    twin.eval()

    path = tmp_path / "sifigan_direct.pkl"
    torch.save({"model": {"generator": twin.state_dict()}}, path)

    model = SiFiGANDirectGenerator(**SMALL, share_upsamples=share_up)
    variables = load_sifigan_checkpoint(str(path), model)

    sine, c, dfs = _example(seed=5)
    with torch.no_grad():
        y_t, e_t = twin(
            torch.from_numpy(np.transpose(sine, (0, 2, 1))),
            torch.from_numpy(np.transpose(c, (0, 2, 1))),
            [torch.from_numpy(d[:, None, :]) for d in dfs],
        )
    y_j, e_j = jax.jit(model.apply)(
        variables, jnp.asarray(sine), jnp.asarray(c),
        [jnp.asarray(d) for d in dfs],
    )

    np.testing.assert_allclose(
        np.asarray(y_j)[:, :, 0], y_t.numpy()[:, 0, :], atol=5e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(e_j)[:, :, 0], e_t.numpy()[:, 0, :], atol=5e-4, rtol=0)


def test_converter_rejects_unknown_keys(tmp_path):
    torch.manual_seed(1)
    twin = SiFiGANGeneratorTorch(**SMALL_TORCH, use_weight_norm=False)
    sd = twin.state_dict()
    sd["sn.mystery.weight"] = torch.zeros(1)
    path = tmp_path / "bad.pkl"
    torch.save({"model": {"generator": sd}}, path)
    model = SiFiGANGenerator(**SMALL)
    with pytest.raises(ValueError, match="unconsumed"):
        load_sifigan_checkpoint(str(path), model)


def test_full_size_conversion_shapes(tmp_path):
    """Full released-architecture config (sifigan.yaml: 43ch in, 512ch,
    5·4·3·2) converts and runs."""
    torch.manual_seed(2)
    twin = SiFiGANGeneratorTorch(use_weight_norm=True)
    path = tmp_path / "full.pkl"
    torch.save({"model": {"generator": twin.state_dict()}}, path)
    model = SiFiGANGenerator()
    variables = load_sifigan_checkpoint(str(path), model)

    sine, c, dfs = _example(tf=8, scales=(5, 4, 3, 2), in_channels=43)
    y, e = model.apply(variables, jnp.asarray(sine), jnp.asarray(c),
                       [jnp.asarray(d) for d in dfs])
    assert y.shape == (1, 8 * 120, 1)
    assert e.shape == (1, 8 * 120, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_postprocessing_cli_with_checkpoint(tmp_path, caplog):
    """Stage-9 CLI loads a converted checkpoint — no RANDOM-weights path
    (reference ssc_postprocessing.py:92-99)."""
    import logging
    import os
    import sys

    import yaml

    from serenade_tpu.bin.ssc_postprocessing import main
    from serenade_tpu.utils.audio import read_wav, write_wav
    from serenade_tpu.utils.h5 import write_hdf5

    sr = 24000
    torch.manual_seed(3)
    twin = SiFiGANGeneratorTorch(
        in_channels=43, channels=32,
        upsample_scales=(5, 4, 3, 2), upsample_kernel_sizes=(10, 8, 6, 4),
    )
    ckpt = tmp_path / "sifigan_twin.pkl"
    torch.save({"model": {"generator": twin.state_dict()}}, ckpt)

    t = np.arange(int(0.3 * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "utt_Tenor_Breathy.wav"), wav, sr)
    n_frames = len(wav) // 120
    lf0 = np.full((n_frames, 1), 220.0, np.float32)
    write_hdf5(str(tmp_path / "utt_Tenor_Breathy.h5"), "lf0", lf0)

    cfg = tmp_path / "post.yml"
    with open(cfg, "w") as f:
        yaml.safe_dump(dict(
            sample_rate=sr,
            generator=dict(
                in_channels=43, channels=32,
                upsample_scales=[5, 4, 3, 2],
                upsample_kernel_sizes=[10, 8, 6, 4],
            ),
        ), f)

    old = sys.argv
    sys.argv = ["prog", "--in-dir", str(tmp_path), "--config", str(cfg),
                "--checkpoint-path", str(ckpt)]
    try:
        with caplog.at_level(logging.WARNING):
            main()
    finally:
        sys.argv = old

    assert not any("RANDOM" in r.message for r in caplog.records)
    out = str(tmp_path / "utt_Tenor_Breathy_sifigan.wav")
    assert os.path.exists(out)
    y, _ = read_wav(out)
    assert np.isfinite(y).all() and np.abs(y).max() > 0
