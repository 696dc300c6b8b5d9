"""Tests for scalers, masking, h5 I/O, and the collater."""

import numpy as np
import jax.numpy as jnp

from serenade_tpu.collaters import SSCCollater, SSCCollaterNew
from serenade_tpu.utils import (
    HDF5ScpLoader,
    MinMaxScaler,
    StandardScaler,
    read_hdf5,
    write_hdf5,
)
from serenade_tpu.utils.masking import length_mask, segment_mask


def test_standard_scaler_matches_sklearn():
    from sklearn.preprocessing import StandardScaler as SkStandard

    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(50, 4)) * (i + 1) for i in range(5)]
    ours, theirs = StandardScaler(), SkStandard()
    for c in chunks:
        ours.partial_fit(c)
        theirs.partial_fit(c)
    np.testing.assert_allclose(ours.mean_, theirs.mean_, rtol=1e-10)
    np.testing.assert_allclose(ours.scale_, theirs.scale_, rtol=1e-8)
    x = rng.normal(size=(7, 4))
    np.testing.assert_allclose(ours.transform(x), theirs.transform(x), rtol=1e-8)


def test_minmax_scaler_matches_sklearn():
    from sklearn.preprocessing import MinMaxScaler as SkMinMax

    rng = np.random.default_rng(1)
    chunks = [rng.normal(size=(30, 3)) for _ in range(4)]
    ours, theirs = MinMaxScaler(), SkMinMax()
    for c in chunks:
        ours.partial_fit(c)
        theirs.partial_fit(c)
    np.testing.assert_allclose(ours.data_min_, theirs.data_min_)
    np.testing.assert_allclose(ours.data_max_, theirs.data_max_)
    x = rng.normal(size=(5, 3))
    np.testing.assert_allclose(ours.transform(x), theirs.transform(x), rtol=1e-10)


def test_length_and_segment_masks():
    m = np.asarray(length_mask(jnp.array([3, 5]), 6))
    assert m.tolist() == [[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]]
    s = np.asarray(segment_mask(2, 4, 6))
    assert s.tolist() == [0, 0, 1, 1, 0, 0]


def test_h5_roundtrip_and_scp(tmp_path):
    p = str(tmp_path / "a.h5")
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    write_hdf5(p, "feats", data)
    write_hdf5(p, "extra", np.ones(3))
    np.testing.assert_array_equal(read_hdf5(p, "feats"), data)

    scp = tmp_path / "feats.scp"
    scp.write_text(f"utt1 {p}:feats\nutt2 {p}:feats,extra\n")
    loader = HDF5ScpLoader(str(scp))
    np.testing.assert_array_equal(loader["utt1"], data)
    assert loader["utt2"].shape == (3, 5)  # concat with column-promoted 1-D


def _fake_item(t, fluc=False):
    item = {
        "hubert": np.ones((t, 8), np.float32),
        "logmel": np.ones((t, 4), np.float32),
        "loud": np.ones((t, 1), np.float32),
        "score": np.ones((t, 1), np.float32),
    }
    if fluc:
        item["f0_fluc"] = np.ones((t, 1), np.float32)
    return item


def test_collater_buckets_sorts_and_drops():
    c = SSCCollater(max_frames=3000, bucket_multiple=64)
    batch = [_fake_item(100), _fake_item(130), _fake_item(3000)]
    out = c(batch)
    assert out["xs"].shape == (2, 192, 8)  # 130 -> bucket 192; 3000 dropped
    assert out["lens"].tolist() == [130, 100]
    # padding is zero beyond each length
    assert out["xs"][1, 100:].sum() == 0


def test_collater_new_includes_fluc():
    c = SSCCollaterNew()
    out = c([_fake_item(70, fluc=True)])
    assert "f0_flucs" in out and out["f0_flucs"].shape == (1, 128, 1)


def test_feats_dataset_cyclic_fallback_is_gated(tmp_path):
    """A train dump missing cyclic_logmel must FAIL loudly (silent
    identity-target training would hide a broken stage-6 injection); the
    logmel fallback is opt-in for dev/eval datasets, whose original dumps
    legitimately carry no cyclic key."""
    import pytest

    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5

    t = 32
    path = str(tmp_path / "utt.h5")
    for key, arr in {
        "wave": np.zeros(t * 240, np.float32),
        "hubert": np.zeros((t, 8), np.float32),
        "logmel": np.ones((t, 4), np.float32),
        "est_lf0_score": np.zeros((t, 1), np.float32),
        "midi": np.zeros((t, 1), np.float32),
        "loud": np.zeros((t, 1), np.float32),
        "f0": np.zeros((t, 1), np.float32),
    }.items():
        write_hdf5(path, key, arr)

    strict = FeatsDataset(str(tmp_path), logmel_type="cyclic_logmel")
    with pytest.raises(KeyError, match="cyclic_logmel"):
        strict[0]

    dev = FeatsDataset(str(tmp_path), logmel_type="cyclic_logmel",
                       logmel_fallback=True)
    np.testing.assert_array_equal(dev[0]["logmel"], np.ones((t, 4)))

    write_hdf5(path, "cyclic_logmel", 2.0 * np.ones((t, 4), np.float32))
    np.testing.assert_array_equal(strict[0]["logmel"], 2.0 * np.ones((t, 4)))
    np.testing.assert_array_equal(dev[0]["logmel"], 2.0 * np.ones((t, 4)))


def test_read_hdf5_many_raw_fast_path(tmp_path):
    """The raw-offset fast path must (a) byte-match h5py, (b) return
    WRITABLE arrays (the dataset normalizes in place), (c) invalidate its
    offset cache when the file is rewritten, and (d) fall back to h5py
    for chunked/compressed datasets."""
    import h5py

    from serenade_tpu.utils.h5 import (
        _RAW_META_CACHE, read_hdf5_many, write_hdf5,
    )

    p = str(tmp_path / "utt.h5")
    a = np.arange(24, dtype=np.float32).reshape(6, 4)
    write_hdf5(p, "hubert", a)
    write_hdf5(p, "f0", np.ones(6, np.float32))
    with h5py.File(p, "a") as f:  # a chunked dataset the raw path must skip
        f.create_dataset("chunky", data=np.full((8, 3), 7.0),
                         chunks=(4, 3), compression="gzip")

    out = read_hdf5_many(p, ("hubert", "f0", "chunky", "missing"))
    np.testing.assert_array_equal(out["hubert"], a)
    np.testing.assert_array_equal(out["chunky"], np.full((8, 3), 7.0))
    assert out["missing"] is None
    out["hubert"] -= 1.0  # writable
    raw = _RAW_META_CACHE[p][2]
    assert "hubert" in raw and "chunky" not in raw

    # rewrite: offsets may move; the (mtime, size) check must re-scan
    b = np.arange(40, dtype=np.float32).reshape(10, 4) * 3
    import os as _os
    import time as _time

    _time.sleep(0.01)
    _os.remove(p)
    write_hdf5(p, "hubert", b)
    out2 = read_hdf5_many(p, ("hubert",))
    np.testing.assert_array_equal(out2["hubert"], b)


def test_feats_dataset_lengths_primes_raw_cache(tmp_path):
    """lengths() shares the raw metadata cache with read_hdf5_many."""
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import _RAW_META_CACHE, write_hdf5

    for i, t in enumerate((32, 48)):
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "hubert", np.zeros((t, 8), np.float32))
        write_hdf5(p, "logmel", np.zeros((t, 4), np.float32))
        for k in ("midi", "loud", "est_lf0_score", "f0"):
            write_hdf5(p, k, np.zeros((t, 1), np.float32))
        write_hdf5(p, "wave", np.zeros(t * 240, np.float32))

    ds = FeatsDataset(str(tmp_path), scaler=None, allow_cache=False)
    np.testing.assert_array_equal(ds.lengths(), [32, 48])
    assert all(str(tmp_path / f"u{i}.h5") in _RAW_META_CACHE
               for i in range(2))
    item = ds[0]
    assert item["hubert"].shape == (32, 8)


def test_collater_pad_frames_to_pins_one_bucket():
    """pad_frames_to pins the time axis (one compiled program): shorter
    items pad, longer items truncate with their lens clamped."""
    from serenade_tpu.collaters.ssc import SSCCollater

    def item(t):
        return {"hubert": np.ones((t, 4), np.float32),
                "logmel": np.ones((t, 3), np.float32),
                "loud": np.ones((t, 1), np.float32),
                "score": np.ones((t, 1), np.float32)}

    c = SSCCollater(pad_frames_to=128)
    out = c([item(100), item(150)])
    assert out["xs"].shape == (2, 128, 4)
    np.testing.assert_array_equal(sorted(out["lens"]), [100, 128])
    # padding is zero beyond each item's true length
    assert out["xs"][np.argsort(out["lens"])[0], 100:].sum() == 0
