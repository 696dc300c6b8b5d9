"""ShardedBatchLoader: sharding, shuffling, prefetch thread equivalence."""

import numpy as np
import pytest

from serenade_tpu.collaters import SSCCollater
from serenade_tpu.datasets.loader import ShardedBatchLoader


class _FakeDataset:
    def __init__(self, n=12, t=50):
        rng = np.random.default_rng(0)
        self.items = [{
            "hubert": rng.normal(size=(t + i, 4)).astype(np.float32),
            "logmel": rng.normal(size=(t + i, 2)).astype(np.float32),
            "loud": rng.normal(size=(t + i, 1)).astype(np.float32),
            "score": rng.normal(size=(t + i, 1)).astype(np.float32),
        } for i in range(n)]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _loader(**kw):
    return ShardedBatchLoader(
        _FakeDataset(), SSCCollater(), batch_size=4,
        process_index=kw.pop("pi", 0), process_count=kw.pop("pc", 1), **kw
    )


def test_sharding_partitions_indices():
    a = _loader(pi=0, pc=2, shuffle=False)
    b = _loader(pi=1, pc=2, shuffle=False)
    batches_a = list(a)
    batches_b = list(b)
    assert len(batches_a) == len(batches_b) == 1  # 6 items each, batch 4
    # shards see different data (lengths differ by construction)
    assert set(batches_a[0]["lens"].tolist()).isdisjoint(
        batches_b[0]["lens"].tolist())


def test_epoch_reshuffle_changes_order():
    ld = _loader(shuffle=True, seed=1)
    first = [b["lens"].tolist() for b in ld]
    second = [b["lens"].tolist() for b in ld]  # epoch advanced internally
    assert first != second


def test_prefetch_matches_sync():
    ld = _loader(shuffle=True, seed=3)
    ld.prefetch = 0
    ld.set_epoch(0)
    sync_batches = [b["lens"].tolist() for b in ld]
    ld.prefetch = 2
    ld.set_epoch(0)
    pre_batches = [b["lens"].tolist() for b in ld]
    assert sync_batches == pre_batches


def test_prefetch_propagates_errors():
    ld = ShardedBatchLoader(
        _FakeDataset(n=2), SSCCollater(), batch_size=8,
        process_index=0, process_count=1,
    )
    with pytest.raises(ValueError):
        list(ld)


def test_load_keys_trims_reads_and_workers_match(tmp_path):
    """FeatsDataset(load_keys=...) returns exactly the requested streams
    (the train path skips wave/midi/lf0 reads entirely), and the pooled
    item fetch returns the same batches as sequential."""
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5

    rng = np.random.default_rng(0)
    for i in range(4):
        t = 100 + 10 * i
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "wave", rng.standard_normal(t * 240).astype(np.float32))
        write_hdf5(p, "hubert", rng.standard_normal((t, 8)).astype(np.float32))
        write_hdf5(p, "logmel", rng.standard_normal((t, 4)).astype(np.float32))
        for k in ("loud", "est_lf0_score", "midi", "f0"):
            write_hdf5(p, k, rng.standard_normal((t, 1)).astype(np.float32))

    keys = tuple(sorted(set(SSCCollater.FEATURE_KEYS.values())))
    ds = FeatsDataset(str(tmp_path), scaler=None, load_keys=keys)
    item = ds[0]
    assert set(item) == set(keys)

    full = FeatsDataset(str(tmp_path), scaler=None)[0]
    assert {"wave", "midi", "lf0"} <= set(full)
    for k in keys:
        np.testing.assert_array_equal(item[k], full[k])

    co = SSCCollater()
    seq = ShardedBatchLoader(ds, co, batch_size=4, shuffle=False,
                             process_index=0, process_count=1,
                             num_workers=0)
    pooled = ShardedBatchLoader(ds, co, batch_size=4, shuffle=False,
                                process_index=0, process_count=1,
                                num_workers=4)
    b0 = next(iter(seq))
    b1 = next(iter(pooled))
    for k in b0:
        np.testing.assert_array_equal(b0[k], b1[k])
