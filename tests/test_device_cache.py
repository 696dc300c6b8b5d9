"""Device-resident training data (datasets/device_cache.py): build,
epoch iteration, and the fused on-device gather."""

import numpy as np

import jax
import jax.numpy as jnp


def _tiny_dataset(tmp_path, n=5, tmax=40):
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5

    lens = []
    for i in range(n):
        t = 20 + 5 * i
        lens.append(min(t, tmax))
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "hubert",
                   np.full((t, 8), i, np.float32))
        write_hdf5(p, "logmel", np.full((t, 4), 10 + i, np.float32))
        for k in ("midi", "loud", "est_lf0_score", "f0"):
            write_hdf5(p, k, np.full((t, 1), i, np.float32))
        write_hdf5(p, "wave", np.zeros(t * 240, np.float32))
    return FeatsDataset(str(tmp_path), scaler=None, allow_cache=False), lens


def test_build_iterate_and_gather(tmp_path):
    from serenade_tpu.datasets.device_cache import DeviceResidentData

    ds, lens = _tiny_dataset(tmp_path)
    dr = DeviceResidentData(ds, pad_frames_to=32, batch_size=2, seed=3)

    assert dr.arrays["x"].shape == (5, 32, 8)
    assert dr.arrays["x"].dtype == jnp.float32  # cache-key parity with host batches
    assert dr.arrays["logmel"].dtype == jnp.float32  # exact CFM targets
    np.testing.assert_array_equal(np.asarray(dr.lens),
                                  np.minimum(lens, 32))

    # one epoch covers the dataset (drop_last wraps the tail)
    seen = set()
    batches = list(dr)
    assert len(batches) == len(dr) == 2
    for b in batches:
        assert b["indices"].shape == (2,)
        seen.update(b["indices"].tolist())
    # different epochs shuffle differently
    b2 = list(dr)
    assert any(not np.array_equal(a["indices"], b["indices"])
               for a, b in zip(batches, b2)) or len(batches) == 1

    # wrap_step: the gathered batch matches a host-side gather
    def fake_step(state, batch, rng):
        return state, batch  # surface the gathered batch as "metrics"

    step = dr.wrap_step(fake_step)
    idx = np.array([3, 1], np.int32)
    _, out = step(jnp.zeros(()), {"indices": jnp.asarray(idx)},
                  jax.random.key(0))
    got = {k: np.asarray(v) for k, v in out.items()}
    np.testing.assert_array_equal(got["lengths"],
                                  np.minimum([lens[3], lens[1]], 32))
    # item values are the item index -> gather order is exact
    assert np.allclose(got["x"][0, :lens[3]], 3.0)
    assert np.allclose(got["x"][1, :lens[1]], 1.0)
    assert np.allclose(got["logmel"][1, :lens[1]], 11.0)
    # padding stays zero
    assert got["x"][1, lens[1]:].sum() == 0
