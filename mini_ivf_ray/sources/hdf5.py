"""HDF5 vector IO — the reference's ann-benchmarks ingestion surface
(hdf5_io.h:52-87: 2-D float/int datasets named train/test/neighbors/
distances).

Round 3: no longer import-gated.  `sources/h5lite.py` implements the
needed subset of the public HDF5 file format directly (superblock v0 +
contiguous numeric datasets — the stock h5py/ann-benchmarks layout), so
read/write work with zero third-party dependencies.  Round 4 extends
the subset to CHUNKED datasets with deflate(gzip)/shuffle/fletcher32
filter pipelines (the stock h5py compression combo); ``h5py``, when
present, remains the fallback for the rest (v2+ superblocks, compact
layout, unregistered filters, nested groups).

The distributed reader exploits the layout: dataset metadata is parsed
ONCE on the driver, then each task range-reads its own rows —
contiguous datasets as one seek + one raw read (the fixed-record
pattern of the fvecs reader, `sources/vectors.py`); chunked datasets
touch only the chunks overlapping the task's row range.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.sources import h5lite


def _h5py():
    try:
        import h5py  # noqa: F401

        return h5py
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "this HDF5 file uses features beyond the built-in h5lite "
            "subset (chunked/compressed/v2 superblock) and h5py is not "
            "installed; re-export it with contiguous datasets or install "
            "h5py"
        ) from e


def read_hdf5_matrix(path: str, dataset: str = "train") -> np.ndarray:
    """Whole 2-D dataset -> numpy array (reference load_from_file_hdf5,
    hdf5_io.h:68-87).  h5lite-first; h5py only for unsupported layouts."""
    try:
        return h5lite.read_h5(path, dataset)
    except ValueError as err:
        if "use h5py" not in str(err):
            raise
        h5py = _h5py()
        with h5py.File(path, "r") as f:  # pragma: no cover - needs h5py
            return f[dataset][...]


def write_hdf5_matrix(path: str, mat: np.ndarray, dataset: str = "train") -> str:
    """(N, D) array -> HDF5 dataset (reference write_to_file_hdf5,
    hdf5_io.h:52-64).  Append/replace semantics over the h5lite subset:
    existing root datasets are preserved, ``dataset`` is replaced."""
    import os

    existing: dict[str, np.ndarray] = {}
    if os.path.exists(path):
        for name in h5lite.read_h5_meta(path):
            if name != dataset:
                existing[name] = h5lite.read_h5(path, name)
    existing[dataset] = np.asarray(mat)
    return h5lite.write_h5(path, existing)


class _H5RangeReader:
    """Task-side row-range reader: one seek + one contiguous raw read
    per batch, using driver-parsed (offset, dtype, shape) metadata."""

    def __init__(self, path: str, info: h5lite.DatasetInfo, id_offset: int):
        self.path, self.info, self.id_offset = path, info, id_offset

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        lo, hi = int(idx.min()), int(idx.max())
        rows = h5lite.read_h5(self.path, self.info.name, rows=(lo, hi + 1))[
            idx - lo
        ]
        if rows.ndim == 1:
            rows = rows[:, None]
        flat = pa.array(rows.reshape(-1))
        emb = pa.FixedSizeListArray.from_arrays(flat, rows.shape[1]).cast(
            pa.list_(flat.type)
        )
        return pa.table(
            {
                "vec_id": pa.array(idx + self.id_offset, type=pa.int64()),
                "embedding": emb,
            }
        )


def read_hdf5_vectors(path: str, dataset: str = "train", id_offset: int = 0):
    """Distributed (vec_id, embedding) Dataset over an HDF5 2-D dataset —
    the same surface as sources.vectors.read_vectors, feeding the ANN
    build/query pipelines."""
    import ray
    import ray.data

    info = h5lite.read_h5_meta(path)[dataset]
    n = info.shape[0]
    if n == 0:
        pa_type = pa.from_numpy_dtype(info.dtype)
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa_type)),
                }
            )
        )
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    blocks = min(max(8, 2 * n_cpus), max(1, n // 1024))
    ds = ray.data.range(n, override_num_blocks=blocks)
    return ds.map_batches(
        _H5RangeReader,
        fn_constructor_args=(path, info, id_offset),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
        num_cpus=1,
    )
