"""HiFiGAN tests: shape/upsampling contract, and numerical parity of the
torch-checkpoint converter against a torch replica of the reference
generator layout (module names from reference hifigan.py:71-190)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from serenade_tpu.vocoder.hifigan import HiFiGANGenerator
from serenade_tpu.vocoder.convert import convert_hifigan_generator

CFG = dict(
    in_channels=8,
    channels=16,
    kernel_size=7,
    upsample_scales=(2, 2),
    upsample_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3,),
    resblock_dilations=((1, 3),),
)


def test_generator_shapes():
    model = HiFiGANGenerator(**CFG)
    c = jnp.zeros((2, 32, 8))
    params = jax.jit(lambda c: model.init(jax.random.key(0), c))(c)
    y = jax.jit(lambda p, c: model.apply(p, c))(params, c)
    assert y.shape == (2, 32 * 4, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)


def _torch_generator():
    """Minimal torch twin with the reference's module naming."""
    import torch
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    class ResBlock(nn.Module):
        def __init__(self, ch, k, dils):
            super().__init__()
            self.convs1 = nn.ModuleList([
                nn.Sequential(
                    nn.LeakyReLU(0.1),
                    weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                          padding=(k - 1) // 2 * d)),
                ) for d in dils
            ])
            self.convs2 = nn.ModuleList([
                nn.Sequential(
                    nn.LeakyReLU(0.1),
                    weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2)),
                ) for _ in dils
            ])

        def forward(self, x):
            for c1, c2 in zip(self.convs1, self.convs2):
                x = x + c2(c1(x))
            return x

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            ch = CFG["channels"]
            self.input_conv = weight_norm(
                nn.Conv1d(CFG["in_channels"], ch, 7, padding=3))
            self.upsamples = nn.ModuleList()
            self.blocks = nn.ModuleList()
            for i, (s, k) in enumerate(zip(CFG["upsample_scales"],
                                           CFG["upsample_kernel_sizes"])):
                self.upsamples.append(nn.Sequential(
                    nn.LeakyReLU(0.1),
                    weight_norm(nn.ConvTranspose1d(
                        ch // (2 ** i), ch // (2 ** (i + 1)), k, s,
                        padding=s // 2 + s % 2, output_padding=s % 2)),
                ))
                for kr, dils in zip(CFG["resblock_kernel_sizes"],
                                    CFG["resblock_dilations"]):
                    self.blocks.append(ResBlock(ch // (2 ** (i + 1)), kr, dils))
            self.output_conv = nn.Sequential(
                nn.LeakyReLU(),
                weight_norm(nn.Conv1d(ch // (2 ** len(CFG["upsample_scales"])),
                                      1, 7, padding=3)),
                nn.Tanh(),
            )

        def forward(self, c):
            c = self.input_conv(c)
            nb = len(CFG["resblock_kernel_sizes"])
            for i in range(len(CFG["upsample_scales"])):
                c = self.upsamples[i](c)
                cs = 0.0
                for j in range(nb):
                    cs = cs + self.blocks[i * nb + j](c)
                c = cs / nb
            return self.output_conv(c)

    torch.manual_seed(0)
    return Gen()


def test_converter_matches_torch():
    torch = pytest.importorskip("torch")
    gen = _torch_generator()
    gen.eval()

    mel = np.random.default_rng(0).normal(size=(1, 8, 48)).astype(np.float32)
    with torch.no_grad():
        ref = gen(torch.from_numpy(mel)).numpy()[0, 0]

    params = convert_hifigan_generator(
        gen.state_dict(),
        num_upsamples=len(CFG["upsample_scales"]),
        num_blocks=len(CFG["resblock_kernel_sizes"]),
        resblock_dilations=CFG["resblock_dilations"],
    )
    model = HiFiGANGenerator(**CFG)
    y = model.apply(params, jnp.asarray(mel.transpose(0, 2, 1)))
    ours = np.asarray(y)[0, :, 0]
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_vocoder_loads_inframework_orbax_checkpoint(tmp_path):
    """Vocoder accepts serenade-vocoder-train orbax checkpoints alongside
    torch pickles — a self-trained HiFiGAN plugs into decode/serving."""
    import jax
    import numpy as np
    import yaml

    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator
    from serenade_tpu.vocoder.vocoder import Vocoder

    gp = dict(in_channels=8, channels=16, upsample_scales=[4, 2],
              upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3],
              resblock_dilations=[[1, 3]], use_additional_convs=True)
    gen = HiFiGANGenerator(
        in_channels=8, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    params = gen.init(jax.random.key(0), jnp.zeros((1, 10, 8)))
    save_checkpoint(str(tmp_path / "voc"), 5,
                    {"generator": params, "discriminator": {}})

    cfg_path = tmp_path / "voc.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(dict(sampling_rate=24000, generator_params=gp), f)
    stats_path = str(tmp_path / "stats.h5")
    write_hdf5(stats_path, "mean", np.zeros(8, np.float32))
    write_hdf5(stats_path, "scale", np.ones(8, np.float32))

    voc = Vocoder(str(tmp_path / "voc" / "checkpoint-5steps"),
                  str(cfg_path), stats_path, take_norm_feat=False)
    wav, sr = voc.decode(np.random.default_rng(0).normal(
        size=(12, 8)).astype(np.float32))
    assert sr == 24000
    assert wav.shape[0] == 12 * 8  # upsample product
    assert np.isfinite(wav).all()


def test_decode_batch_device_matches_host(tmp_path):
    """The serving device tail (edge-pad gather + generator + int16
    quantize in one jitted program) must reproduce the host batch path
    (numpy edge-pad + decode_batch) within PCM16 quantization."""
    import jax
    import numpy as np
    import yaml

    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator
    from serenade_tpu.vocoder.vocoder import Vocoder

    gp = dict(in_channels=8, channels=16, upsample_scales=[4, 2],
              upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3],
              resblock_dilations=[[1, 3]], use_additional_convs=True)
    gen = HiFiGANGenerator(
        in_channels=8, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    params = gen.init(jax.random.key(0), jnp.zeros((1, 10, 8)))
    save_checkpoint(str(tmp_path / "voc"), 5,
                    {"generator": params, "discriminator": {}})
    cfg_path = tmp_path / "voc.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(dict(sampling_rate=24000, generator_params=gp), f)
    stats_path = str(tmp_path / "stats.h5")
    write_hdf5(stats_path, "mean", np.zeros(8, np.float32))
    write_hdf5(stats_path, "scale", np.ones(8, np.float32))
    voc = Vocoder(str(tmp_path / "voc" / "checkpoint-5steps"),
                  str(cfg_path), stats_path, take_norm_feat=False)

    rng = np.random.default_rng(1)
    T = 16
    mels = rng.normal(size=(3, T, 8)).astype(np.float32) * 0.5
    lengths = [16, 11, 7]

    # host path: edge-pad each row to T, decode, trim
    stacked = np.stack([
        np.pad(mels[i, :lengths[i]], ((0, T - lengths[i]), (0, 0)),
               mode="edge") for i in range(3)
    ])
    host = voc.decode_batch(stacked)

    dev = np.asarray(jax.device_get(
        voc.decode_batch_device(jnp.asarray(mels), lengths)
    )).astype(np.float32) / 32767.0

    hop = host.shape[1] // T
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            dev[i, : n * hop], np.clip(host[i, : n * hop], -1.0, 1.0),
            atol=1.0 / 32767.0 + 1e-6,
            err_msg=f"row {i} device tail diverges from host path",
        )


def test_decode_batch_device_on_mesh_matches_host(tmp_path):
    """After place_on_mesh, the device tail runs SPMD over the dp mesh
    (batch sharded over 'data', params replicated) and still reproduces
    the host batch path within PCM16 quantization — serving's vocoder
    tail on a pod slice."""
    import jax
    import numpy as np
    import yaml

    from serenade_tpu.checkpoint import save_checkpoint
    from serenade_tpu.parallel import make_mesh
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.vocoder.hifigan import HiFiGANGenerator
    from serenade_tpu.vocoder.vocoder import Vocoder

    gp = dict(in_channels=8, channels=16, upsample_scales=[4, 2],
              upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3],
              resblock_dilations=[[1, 3]], use_additional_convs=True)
    gen = HiFiGANGenerator(
        in_channels=8, channels=16, upsample_scales=(4, 2),
        upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
    )
    params = gen.init(jax.random.key(0), jnp.zeros((1, 10, 8)))
    save_checkpoint(str(tmp_path / "voc"), 5,
                    {"generator": params, "discriminator": {}})
    cfg_path = tmp_path / "voc.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(dict(sampling_rate=24000, generator_params=gp), f)
    stats_path = str(tmp_path / "stats.h5")
    write_hdf5(stats_path, "mean", np.zeros(8, np.float32))
    write_hdf5(stats_path, "scale", np.ones(8, np.float32))
    voc = Vocoder(str(tmp_path / "voc" / "checkpoint-5steps"),
                  str(cfg_path), stats_path, take_norm_feat=False)

    rng = np.random.default_rng(1)
    T, B = 16, 8
    mels = rng.normal(size=(B, T, 8)).astype(np.float32) * 0.5
    lengths = [16, 11, 7, 16, 13, 9, 5, 16]

    stacked = np.stack([
        np.pad(mels[i, :lengths[i]], ((0, T - lengths[i]), (0, 0)),
               mode="edge") for i in range(B)
    ])
    host = voc.decode_batch(stacked)

    voc.place_on_mesh(make_mesh(data=8, model=1))
    out = voc.decode_batch_device(jnp.asarray(mels), lengths)
    # the batch really is sharded: every device holds a 1-row shard
    assert len(out.sharding.device_set) == 8
    dev = np.asarray(jax.device_get(out)).astype(np.float32) / 32767.0

    hop = host.shape[1] // T
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            dev[i, : n * hop], np.clip(host[i, : n * hop], -1.0, 1.0),
            atol=1.0 / 32767.0 + 1e-6,
            err_msg=f"row {i} mesh device tail diverges from host path",
        )

    # non-divisible batches are rejected with a clear error
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        voc.decode_batch_device(jnp.asarray(mels[:3]), lengths[:3])
