"""Host-sharded batching loader.

Replaces the reference's DataLoader + DistributedSampler pair
(ssc_train.py:274-309): each JAX process takes an interleaved shard of the
index space (`process_index::process_count`), reshuffled per epoch with a
deterministic seed (epoch-folded, matching DistributedSampler.set_epoch
semantics, trainers/base.py:162-164), batches through the collater, and can
optionally sort-by-length within a shuffle window to minimize bucket
padding waste (a TPU-side improvement: fewer compiled programs, less
padding FLOP).

Note on ``worker_type="process"``: workers use the spawn start method
(fork is unsafe once JAX has initialized), so the launching script must be
importable — code that builds the loader at module top level without an
``if __name__ == "__main__"`` guard will raise the standard multiprocessing
bootstrap error.  Console scripts and pytest are already guarded.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np

# --- process-worker plumbing (module level so spawn can pickle them) ------
_WORKER_DATASET = None


def _proc_worker_init(dataset):
    """Runs once in each spawned worker: keep the (cache-stripped) dataset.

    The dataset is pickled ONCE per worker at pool creation, not per item.
    Workers never import jax (FeatsDataset's import chain is numpy+h5py
    only), so they cannot grab the TPU or trip the platform freeze."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _proc_worker_get(i: int):
    item = _WORKER_DATASET[int(i)]
    # strip utt_id tuples: the batch path discards them anyway and the
    # parent-side cache stores bare items (mirrors FeatsDataset._cache)
    return item[1] if isinstance(item, tuple) else item


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
        worker_type: str = "thread",
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
        # optional worker pool for item fetches.
        #   worker_type="thread": MEASURED (2026-08-19, bench_loader
        #     conditions: page-cached local h5) SLOWER than sequential —
        #     numpy normalization and h5py decode hold the GIL.  Kept for
        #     genuinely IO-bound stores (cold NFS/object mounts).
        #   worker_type="process": spawn-context ProcessPoolExecutor (fork
        #     is unsafe after JAX init); sidesteps the GIL for the decode+
        #     normalize work at the cost of one pickle round-trip per item.
        #     The dataset ships to workers ONCE (pool initializer); the
        #     parent keeps serving/filling the allow_cache dict, so cached
        #     epochs never touch the pool.
        if worker_type not in ("thread", "process"):
            raise ValueError(f"worker_type must be thread|process, got {worker_type!r}")
        self.num_workers = num_workers
        self.worker_type = worker_type
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
            # approximate length-sort inside windows to tighten buckets:
            # items of similar length land in the same batch, so the
            # bucket pad (to the batch max) wastes far less FLOP.  Cheap
            # when the dataset exposes lengths() (h5 shape metadata);
            # falls back to loading items otherwise.
            if hasattr(self.dataset, "lengths"):
                lengths = np.asarray(
                    self.dataset.lengths(self.length_key))[idx]
            else:
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
            yield self.collater(fetch(chunk))
        self.epoch += 1

    @staticmethod
    def _strip(items):
        # normalize (utt_id, item) tuples (return_utt_id datasets) to bare
        # items so every fetch path — sequential, thread, process — returns
        # the same shape to consumers
        return [it[1] if isinstance(it, tuple) else it for it in items]

    def _fetch_items(self, chunk):
        if self.worker_type == "process" and self.num_workers >= 1 \
                and len(chunk) > 1:
            return self._fetch_items_proc([int(i) for i in chunk])
        if self.num_workers <= 1 or len(chunk) <= 1:
            return self._strip([self.dataset[int(i)] for i in chunk])
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="ssc-loader")
        # map preserves order; dataset __getitem__ is read-only per item
        # (the optional cache dict write is a benign same-value race)
        return self._strip(self._pool.map(
            lambda i: self.dataset[int(i)], [int(i) for i in chunk]))

    def _ensure_proc_pool(self):
        if self._pool is None:
            import copy
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            ds = copy.copy(self.dataset)
            if getattr(ds, "_cache", None) is not None:
                ds._cache = None  # workers must not duplicate the parent cache
            ctx = multiprocessing.get_context("spawn")
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers, mp_context=ctx,
                initializer=_proc_worker_init, initargs=(ds,))
        return self._pool

    def _fetch_items_proc(self, ids):
        pool = self._ensure_proc_pool()
        cache = getattr(self.dataset, "_cache", None)
        missing = (ids if cache is None
                   else [i for i in ids if i not in cache])
        fetched = (dict(zip(missing, pool.map(_proc_worker_get, missing)))
                   if missing else {})
        out = []
        for i in ids:
            if cache is not None and i in cache:
                out.append(cache[i])
            else:
                item = fetched[i]
                if cache is not None:
                    cache[i] = item
                out.append(item)
        return out

    def shutdown(self):
        """Tear down the worker pool (idempotent; the loader keeps working
        afterwards, just synchronously until a pool is needed again)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
