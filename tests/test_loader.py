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

def test_process_workers_match_sync_and_fill_cache(tmp_path):
    """worker_type="process" (spawn pool, GIL-free decode+normalize) yields
    byte-identical batches to the sequential path, fills the parent-side
    allow_cache dict, and serves cached epochs without touching the pool."""
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5
    from serenade_tpu.utils.scalers import MinMaxScaler, StandardScaler

    rng = np.random.default_rng(1)
    for i in range(6):
        t = 80 + 10 * i
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "hubert", rng.standard_normal((t, 8)).astype(np.float32))
        write_hdf5(p, "logmel", rng.standard_normal((t, 4)).astype(np.float32))
        for k in ("loud", "est_lf0_score"):
            write_hdf5(p, k, rng.standard_normal((t, 1)).astype(np.float32))

    def z(dim):
        s = StandardScaler()
        s.mean_ = np.full(dim, 0.5, np.float32)
        s.scale_ = np.full(dim, 2.0, np.float32)
        return s

    def mm():
        s = MinMaxScaler()
        s.data_min_ = np.zeros(1, np.float32)
        s.data_max_ = np.ones(1, np.float32)
        return s

    scaler = {"hubert": z(8), "logmel": z(4), "score": mm(), "loud": mm()}
    keys = tuple(sorted(set(SSCCollater.FEATURE_KEYS.values())))
    co = SSCCollater()

    ds_sync = FeatsDataset(str(tmp_path), scaler=scaler, load_keys=keys)
    sync = ShardedBatchLoader(ds_sync, co, batch_size=3, shuffle=True, seed=7,
                              process_index=0, process_count=1)
    sync.prefetch = 0

    ds_proc = FeatsDataset(str(tmp_path), scaler=scaler, load_keys=keys,
                           allow_cache=True)
    proc = ShardedBatchLoader(ds_proc, co, batch_size=3, shuffle=True, seed=7,
                              process_index=0, process_count=1,
                              num_workers=2, worker_type="process")
    proc.prefetch = 0
    try:
        for a, b in zip(sync, proc):
            for k in a:
                assert a[k].dtype == b[k].dtype
                np.testing.assert_array_equal(a[k], b[k])
        assert len(ds_proc._cache) == 6  # parent cache filled by the pool path
        # cached epoch: served from the parent dict, still identical
        sync.set_epoch(1)
        proc.set_epoch(1)
        proc.shutdown()  # prove cached epochs don't need the pool
        for a, b in zip(sync, proc):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
    finally:
        proc.shutdown()


def test_collater_bf16_host_batches():
    """host_dtype="bfloat16" halves the feature bytes; values round to
    bf16 of the f32 collation (lens stays int32)."""
    import ml_dtypes

    ds = _FakeDataset(n=4)
    items = [ds[i] for i in range(4)]
    f32 = SSCCollater()(items)
    bf16 = SSCCollater(host_dtype="bfloat16")(items)
    assert bf16["lens"].dtype == np.int32
    for k in SSCCollater.FEATURE_KEYS:
        assert bf16[k].dtype == ml_dtypes.bfloat16
        assert bf16[k].nbytes * 2 == f32[k].nbytes
        np.testing.assert_array_equal(
            bf16[k], f32[k].astype(ml_dtypes.bfloat16))


def test_sort_window_uses_shape_metadata_and_tightens_buckets(tmp_path):
    """FeatsDataset.lengths() reads h5 shape metadata only; sort_window
    groups similar lengths per batch (tighter buckets, same item multiset
    per epoch)."""
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5

    rng = np.random.default_rng(3)
    true_lens = [64, 200, 70, 190, 66, 210, 72, 195]
    for i, t in enumerate(true_lens):
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "hubert", rng.standard_normal((t, 8)).astype(np.float32))
        write_hdf5(p, "logmel", rng.standard_normal((t, 4)).astype(np.float32))
        for k in ("loud", "est_lf0_score"):
            write_hdf5(p, k, rng.standard_normal((t, 1)).astype(np.float32))

    ds = FeatsDataset(str(tmp_path), scaler=None,
                      load_keys=tuple(sorted(set(
                          SSCCollater.FEATURE_KEYS.values()))))
    # lengths() sees every utterance without loading feature data
    np.testing.assert_array_equal(np.sort(ds.lengths()),
                                  np.sort(true_lens))

    co = SSCCollater(bucket_multiple=64)
    sorted_ld = ShardedBatchLoader(ds, co, batch_size=4, shuffle=True,
                                   seed=11, process_index=0, process_count=1,
                                   sort_window=2)
    batches = list(sorted_ld)
    # window = 2 batches = all 8 items -> short 4 and long 4 separate:
    # one batch buckets at 128 (max 72), the other at 256 (max 210)
    buckets = sorted(b["xs"].shape[1] for b in batches)
    assert buckets == [128, 256]
    seen = sorted(l for b in batches for l in b["lens"].tolist())
    assert seen == sorted(true_lens)


def test_lengths_respects_length_key(tmp_path):
    """ADVICE r3: a loader configured with a non-default length_key must
    sort by THAT stream's lengths, not silently by hubert's (the fast
    hasattr(dataset, 'lengths') path takes precedence over the item-load
    fallback)."""
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5

    rng = np.random.default_rng(5)
    hub_lens = [64, 200, 70, 190]
    mel_lens = [200, 64, 190, 70]  # deliberately misaligned streams
    for i, (th, tm) in enumerate(zip(hub_lens, mel_lens)):
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "hubert", rng.standard_normal((th, 8)).astype(np.float32))
        write_hdf5(p, "logmel", rng.standard_normal((tm, 4)).astype(np.float32))

    ds = FeatsDataset(str(tmp_path), scaler=None,
                      load_keys=("hubert", "logmel"))
    np.testing.assert_array_equal(ds.lengths(), hub_lens)
    np.testing.assert_array_equal(ds.lengths("logmel"), mel_lens)
    # per-key caching: second call hits the cache, same values
    np.testing.assert_array_equal(ds.lengths("logmel"), mel_lens)


def test_fetch_paths_strip_utt_id_tuples(tmp_path):
    """ADVICE r3: every fetch path (sequential/thread) returns bare item
    dicts even when the dataset yields (utt_id, item) tuples."""
    from serenade_tpu.datasets.feats_dataset import FeatsDataset
    from serenade_tpu.utils.h5 import write_hdf5

    rng = np.random.default_rng(7)
    for i in range(4):
        p = str(tmp_path / f"u{i}.h5")
        write_hdf5(p, "hubert",
                   rng.standard_normal((64, 8)).astype(np.float32))
        write_hdf5(p, "logmel",
                   rng.standard_normal((64, 4)).astype(np.float32))

    ds = FeatsDataset(str(tmp_path), scaler=None, return_utt_id=True,
                      load_keys=("hubert", "logmel"))
    for workers in (0, 2):
        ld = ShardedBatchLoader(ds, lambda items: items, batch_size=4,
                                shuffle=False, process_index=0,
                                process_count=1, num_workers=workers)
        items = ld._fetch_items(np.arange(4))
        assert all(isinstance(it, dict) for it in items)
