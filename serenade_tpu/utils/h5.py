"""HDF5 / npy dump I/O and Kaldi-style scp loaders.

Feature dumps are the filesystem contract between pipeline stages (the
reference stages communicate only through `.h5` files — see
/root/reference/serenade/utils/utils.py:50,78,124,208).  The on-disk layout is
kept compatible: one `.h5` per utterance holding named datasets
(`wave`, `hubert`, `logmel`, `loud`, `gt_lf0_score`, `est_lf0_score`, `f0`,
`vuv`, `midi`[, `f0_fluc`]).
"""

from __future__ import annotations

import fnmatch
import logging
import os
from typing import Dict, Iterator

import h5py
import numpy as np

logger = logging.getLogger(__name__)


def find_files(root_dir: str, query: str = "*.wav", include_root_dir: bool = True):
    """Recursively find files matching ``query`` under ``root_dir``."""
    found = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            found.append(os.path.join(root, filename))
    if not include_root_dir:
        prefix = root_dir.rstrip("/") + "/"
        found = [f[len(prefix):] if f.startswith(prefix) else f for f in found]
    return found


def read_hdf5(path: str, dataset: str):
    """Read one dataset from an hdf5 file; returns None on missing file/key."""
    if not os.path.exists(path):
        logger.error("no such hdf5 file: %s", path)
        return None
    with h5py.File(path, "r") as f:
        if dataset not in f:
            logger.error("no dataset %r in %s", dataset, path)
            return None
        return f[dataset][()]


# path -> (mtime_ns, size, {name: (offset, shape, dtype_str)}, all_names).
# Offsets of contiguous uncompressed datasets are stable for write-once
# dumps; the (mtime, size) pair invalidates on rewrite.  Worker threads
# may race on insertion — worst case is a duplicate metadata pass.
_RAW_META_CACHE: Dict[str, tuple] = {}


def _raw_meta(path: str):
    """(raw_readable, all_names) for ``path``: which datasets can bypass
    h5py entirely (contiguous + uncompressed + plain numeric dtype, with
    a known file offset) and which names exist at all."""
    st = os.stat(path)
    cached = _RAW_META_CACHE.get(path)
    if cached is not None and cached[0] == st.st_mtime_ns and \
            cached[1] == st.st_size:
        return cached[2], cached[3]
    meta: Dict[str, tuple] = {}
    names = set()

    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if not isinstance(obj, h5py.Dataset):
                return
            names.add(name)
            if (obj.chunks is None and obj.compression is None
                    and obj.dtype.kind in "fiu"):
                off = obj.id.get_offset()
                if off is not None:
                    meta[name] = (off, obj.shape, obj.dtype.str)
        f.visititems(visit)
    _RAW_META_CACHE[path] = (st.st_mtime_ns, st.st_size, meta, names)
    return meta, names


def read_hdf5_many(path: str, datasets) -> Dict[str, np.ndarray]:
    """Read several datasets in ONE file open — the hot loader path.

    ``read_hdf5`` per key opens/closes the file once per dataset; at 7+
    keys per training item the open/close overhead is a measurable slice
    of input-pipeline throughput (see bench.py::bench_loader).  Missing
    keys map to None (same contract as read_hdf5, without the error log
    — callers decide what is required).

    Contiguous uncompressed datasets (what write_hdf5 produces) bypass
    h5py entirely after a one-time metadata pass: the dataset's file
    offset is cached and the bytes are read with a plain seek+fromfile —
    measured ~4× less per-item overhead than h5py dataset reads on
    page-cached dumps (h5py's selection machinery costs ~1 ms per 2.7 MB
    read; the raw read is a memcpy).  The metadata cache is shared with
    ``FeatsDataset.lengths()``, so sort_window batching primes it for
    free.  Falls back to h5py for chunked/compressed/exotic datasets.
    """
    if not os.path.exists(path):
        logger.error("no such hdf5 file: %s", path)
        return {name: None for name in datasets}
    try:
        raw, all_names = _raw_meta(path)
    except Exception:  # corrupt header etc. — let h5py produce the error
        raw, all_names = {}, None
    out = {}
    h5_needed = [n for n in datasets
                 if n not in raw and (all_names is None or n in all_names)]
    if h5_needed:
        with h5py.File(path, "r") as f:
            for name in h5_needed:
                out[name] = f[name][()] if name in f else None
    raw_needed = [n for n in datasets if n in raw and n not in out]
    if raw_needed:
        with open(path, "rb") as fh:
            for name in raw_needed:
                off, shape, dtype = raw[name]
                fh.seek(off)
                n_elems = int(np.prod(shape)) if shape else 1
                arr = np.fromfile(fh, dtype=np.dtype(dtype), count=n_elems)
                out[name] = arr.reshape(shape)
    for name in datasets:
        out.setdefault(name, None)
    return out


def dataset_shape(path: str, name: str):
    """Shape of one dataset from (cached) metadata only — no data read.
    None when the file/dataset is missing."""
    if not os.path.exists(path):
        return None
    raw, all_names = _raw_meta(path)
    if name in raw:
        return raw[name][1]
    if all_names is not None and name not in all_names:
        return None
    with h5py.File(path, "r") as f:
        return f[name].shape if name in f else None


def hdf5_has(path: str, dataset: str) -> bool:
    """True iff ``path`` exists and contains ``dataset`` (no error logging)."""
    if not os.path.exists(path):
        return False
    with h5py.File(path, "r") as f:
        return dataset in f


def write_hdf5(path: str, dataset: str, data, is_overwrite: bool = True) -> None:
    """Write one dataset into an hdf5 file, creating parent dirs as needed.

    Overwrites an existing dataset when ``is_overwrite`` (the reference exits
    the process in the non-overwrite collision case, utils.py:104-113; we
    raise instead — a library should not ``sys.exit``).
    """
    data = np.asarray(data)
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    mode = "r+" if os.path.exists(path) else "w"
    with h5py.File(path, mode) as f:
        if dataset in f:
            if not is_overwrite:
                raise FileExistsError(f"dataset {dataset!r} already exists in {path}")
            del f[dataset]
        f.create_dataset(dataset, data=data)


class _ScpLoader:
    """Base: parse a 2-column `key path` scp file."""

    def __init__(self, scp_path: str):
        self.data: Dict[str, str] = {}
        with open(scp_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                key, value = line.split(maxsplit=1)
                self.data[key] = value

    def get_path(self, key: str) -> str:
        return self.data[key]

    def __len__(self) -> int:
        return len(self.data)

    def __iter__(self) -> Iterator[str]:
        return iter(self.data)

    def keys(self):
        return self.data.keys()

    def values(self):
        for key in self.keys():
            yield self[key]

    def __getitem__(self, key: str):  # pragma: no cover - abstract
        raise NotImplementedError


class HDF5ScpLoader(_ScpLoader):
    """Loader for hdf5-backed feats.scp.

    Supports the three reference line formats (utils.py:124-155):
    ``key path.h5`` (uses ``default_hdf5_path``), ``key path.h5:name``, and
    ``key path.h5:name1,name2`` (concatenated along the feature axis, 1-D
    entries promoted to column vectors).
    """

    def __init__(self, scp_path: str, default_hdf5_path: str = "feats"):
        super().__init__(scp_path)
        self.default_hdf5_path = default_hdf5_path

    def __getitem__(self, key: str):
        entry = self.data[key]
        if ":" not in entry:
            return read_hdf5(entry, self.default_hdf5_path)
        path, names = entry.split(":")
        parts = names.split(",")
        if len(parts) == 1:
            return read_hdf5(path, parts[0])
        feats = [read_hdf5(path, name) for name in parts]
        feats = [f.reshape(-1, 1) if f.ndim == 1 else f for f in feats]
        return np.concatenate(feats, axis=1)


class NpyScpLoader(_ScpLoader):
    """Loader for npy-backed feats.scp (``key path.npy`` lines)."""

    def __getitem__(self, key: str):
        return np.load(self.data[key])


def sniff_feats_scp_loader(scp_path: str, default_hdf5_path: str = "feats"):
    """Pick HDF5 vs npy loader by inspecting the first entry's extension
    (reference datasets/dataset.py:21-45 behavior)."""
    with open(scp_path) as f:
        first = f.readline().split()
    if len(first) < 2:
        raise ValueError(f"empty or malformed scp: {scp_path}")
    value = first[1]
    base = value.split(":")[0]
    if base.endswith(".h5") or base.endswith(".hdf5"):
        return HDF5ScpLoader(scp_path, default_hdf5_path)
    if base.endswith(".npy"):
        return NpyScpLoader(scp_path)
    raise ValueError(f"unsupported feats file format in scp: {value}")
