"""HDF5 vector IO — the reference's ann-benchmarks ingestion surface
(hdf5_io.h:52-87: 2-D float/int datasets named train/test/neighbors/
distances).

``h5py`` is not installed in this build environment, so the functions
are import-gated: the Ray-side plumbing (chunked dataset -> Dataset of
(vec_id, embedding) rows, same shape as sources.vectors.read_vectors)
is real and exercised wherever h5py exists; here calls raise a clear
ImportError.  Everything TexMex-format (fvecs/bvecs/ivecs) is fully
supported and tested in sources/vectors.py — HDF5 is a thin alternate
container around the same (N, D) matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _h5py():
    try:
        import h5py  # noqa: F401

        return h5py
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "h5py is required for HDF5 vector IO but is not installed in "
            "this environment; use sources.vectors (fvecs/bvecs/ivecs) or "
            "Parquet inputs instead"
        ) from e


def read_hdf5_matrix(path: str, dataset: str = "train") -> np.ndarray:
    """Whole 2-D dataset -> numpy array (reference load_from_file_hdf5,
    hdf5_io.h:68-87)."""
    h5py = _h5py()
    with h5py.File(path, "r") as f:
        return f[dataset][...]


def write_hdf5_matrix(path: str, mat: np.ndarray, dataset: str = "train") -> str:
    """(N, D) array -> HDF5 dataset (reference write_to_file_hdf5,
    hdf5_io.h:52-64)."""
    h5py = _h5py()
    with h5py.File(path, "a") as f:
        if dataset in f:
            del f[dataset]
        f.create_dataset(dataset, data=mat)
    return path


class _H5RangeReader:
    """Task-side row-range reader: h5py slicing reads only the chunk."""

    def __init__(self, path: str, dataset: str, id_offset: int):
        self.path, self.dataset, self.id_offset = path, dataset, id_offset
        self._f = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        h5py = _h5py()
        if self._f is None:
            self._f = h5py.File(self.path, "r")
        idx = batch["id"].to_numpy()
        lo, hi = int(idx.min()), int(idx.max())
        rows = self._f[self.dataset][lo : hi + 1][idx - lo]
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

    h5py = _h5py()
    with h5py.File(path, "r") as f:
        n = f[dataset].shape[0]
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = ray.data.range(n, override_num_blocks=max(8, 2 * n_cpus))
    return ds.map_batches(
        _H5RangeReader,
        fn_constructor_args=(path, dataset, id_offset),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
        num_cpus=1,
    )
