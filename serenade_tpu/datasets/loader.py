"""Host-sharded batching loader.

Replaces the reference's DataLoader + DistributedSampler pair
(ssc_train.py:274-309): each JAX process takes an interleaved shard of the
index space (`process_index::process_count`), reshuffled per epoch with a
deterministic seed (epoch-folded, matching DistributedSampler.set_epoch
semantics, trainers/base.py:162-164), batches through the collater, and can
optionally sort-by-length within a shuffle window to minimize bucket
padding waste (a TPU-side improvement: fewer compiled programs, less
padding FLOP).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np


class ShardedBatchLoader:
    def __init__(
        self,
        dataset,
        collater: Callable,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        length_key: str = "hubert",
        sort_window: int = 0,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.collater = collater
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count
        self.sort_window = sort_window
        self.length_key = length_key
        self.epoch = 0
        self.prefetch = 2  # background-thread batch prefetch depth (0 = off)
        # optional thread pool for item fetches.  MEASURED (2026-08-19,
        # bench.py::bench_loader conditions: page-cached local h5): the
        # pool is SLOWER than sequential — the numpy normalization and
        # h5py decode hold the GIL, so threads only add overhead.  Kept
        # (default off) for genuinely IO-bound stores (cold NFS/object
        # mounts) where reads dominate and do release the GIL.
        self.num_workers = num_workers
        self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        shard = len(range(self.process_index, len(self.dataset),
                          self.process_count))
        if self.drop_last:
            return shard // self.batch_size
        return (shard + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.process_index::self.process_count]

    def __iter__(self) -> Iterator:
        """Iterate batches; with ``prefetch > 0`` the h5 reads + collation
        run in a background thread so host IO overlaps the device step
        (the role DataLoader workers play in the reference,
        conf/serenade.yaml:54 — single extra thread suffices since the
        jitted step dominates)."""
        if self.prefetch <= 0:
            yield from self._iter_sync()
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        errbox = []

        def worker():
            try:
                for batch in self._iter_sync():
                    q.put(batch)
            except BaseException as e:  # surface in the consumer thread
                errbox.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if errbox:
            raise errbox[0]

    def _iter_sync(self) -> Iterator:
        if len(self) == 0:
            raise ValueError(
                f"loader would yield zero batches: shard has "
                f"{len(range(self.process_index, len(self.dataset), self.process_count))} "
                f"items for batch_size={self.batch_size} (drop_last="
                f"{self.drop_last}); shrink the batch or the data mesh axis"
            )
        idx = self._epoch_indices()
        if self.sort_window > 1:
            # approximate length-sort inside windows to tighten buckets
            lengths = np.array([
                self.dataset[i][self.length_key].shape[0]
                if isinstance(self.dataset[i], dict) else 0
                for i in idx
            ])
            chunks = []
            w = self.sort_window * self.batch_size
            for s in range(0, len(idx), w):
                window = idx[s:s + w]
                order = np.argsort(lengths[s:s + w])
                chunks.append(window[order])
            idx = np.concatenate(chunks) if chunks else idx
        fetch = self._fetch_items
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s:s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            items = [it[1] if isinstance(it, tuple) else it
                     for it in fetch(chunk)]
            yield self.collater(items)
        self.epoch += 1

    def _fetch_items(self, chunk):
        if self.num_workers <= 1 or len(chunk) <= 1:
            return [self.dataset[int(i)] for i in chunk]
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="ssc-loader")
        # map preserves order; dataset __getitem__ is read-only per item
        # (the optional cache dict write is a benign same-value race)
        return list(self._pool.map(
            lambda i: self.dataset[int(i)], [int(i) for i in chunk]))
