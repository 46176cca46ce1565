"""fvecs / bvecs / ivecs vector-file IO — the reference's native input
formats (binary_io.hpp:16-133, vector_io.py:6-32: every record is an
int32 dimension header followed by ``dim`` elements of float32 /
uint8 / int32 respectively; TexMex SIFT/GIST distribution format).

Two surfaces:
* local numpy readers/writers (round-trip tested, ≅ test_binary_io.cpp
  :11-79) — for driver-side training samples and tests;
* ``read_vectors`` — a DISTRIBUTED Ray Dataset reader: records are
  fixed-size once the (constant) dimension is known, so each read task
  seeks directly to its record range; no single task ever holds the
  file.  Emits (vec_id, embedding) rows; vec_id is the record ordinal
  (the reference's positional id), embedding keeps the on-disk element
  dtype (uint8 vectors stay uint8 — at SIFT100M scale the 8x memory
  difference is the difference between fitting and not,
  index_ivf.cpp:254-255).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

_KINDS = {
    "fvecs": (np.float32, 4, pa.float32()),
    "bvecs": (np.uint8, 1, pa.uint8()),
    "ivecs": (np.int32, 4, pa.int32()),
}


def _kind_of(path: str, kind: str | None) -> str:
    if kind is None:
        kind = os.path.splitext(path)[1].lstrip(".").lower()
    if kind not in _KINDS:
        raise ValueError(f"unknown vector file kind {kind!r} (fvecs/bvecs/ivecs)")
    return kind


def file_geometry(path: str, kind: str | None = None) -> tuple[str, int, int, int]:
    """(kind, dim, record_bytes, n_records) from the header + file size.
    Validates that the file is an exact multiple of the record size
    (i.e. constant dimension, the TexMex invariant)."""
    kind = _kind_of(path, kind)
    dtype, esize, _ = _KINDS[kind]
    with open(path, "rb") as f:
        head = f.read(4)
        if len(head) < 4:
            return kind, 0, 4, 0
        dim = struct.unpack("<i", head)[0]
    if dim <= 0:
        raise ValueError(f"{path}: bad dimension header {dim}")
    rec = 4 + dim * esize
    size = os.path.getsize(path)
    if size % rec:
        raise ValueError(
            f"{path}: size {size} not a multiple of record size {rec} "
            "(variable dimension or truncated file)"
        )
    return kind, dim, rec, size // rec


def read_vecs(path: str, kind: str | None = None) -> np.ndarray:
    """Whole file -> (n, dim) array in the on-disk element dtype."""
    kind, dim, rec, n = file_geometry(path, kind)
    dtype, esize, _ = _KINDS[kind]
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    raw = np.fromfile(path, dtype=np.uint8).reshape(n, rec)
    return raw[:, 4:].copy().view(dtype).reshape(n, dim)


def write_vecs(path: str, mat: np.ndarray, kind: str | None = None) -> str:
    """(n, dim) array -> TexMex file (element dtype from ``kind``)."""
    kind = _kind_of(path, kind)
    dtype, esize, _ = _KINDS[kind]
    mat = np.ascontiguousarray(mat, dtype=dtype)
    n, dim = mat.shape
    rec = np.empty((n, 4 + dim * esize), dtype=np.uint8)
    rec[:, :4] = np.frombuffer(struct.pack("<i", dim), dtype=np.uint8)
    rec[:, 4:] = mat.view(np.uint8).reshape(n, dim * esize)
    tmp = path + ".tmp"
    rec.tofile(tmp)
    os.replace(tmp, path)
    return path


# convenience aliases matching the classical names
def read_fvecs(path: str) -> np.ndarray:
    return read_vecs(path, "fvecs")


def read_bvecs(path: str) -> np.ndarray:
    return read_vecs(path, "bvecs")


def read_ivecs(path: str) -> np.ndarray:
    return read_vecs(path, "ivecs")


class _RangeReader:
    """Task-side record-range reader: seek + one contiguous read."""

    def __init__(self, path: str, kind: str, dim: int, rec: int, id_offset: int):
        self.path, self.kind = path, kind
        self.dim, self.rec = dim, rec
        self.id_offset = id_offset
        self.dtype, self.esize, self.pa_type = _KINDS[kind]

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        lo, hi = int(idx.min()), int(idx.max())
        with open(self.path, "rb") as f:
            f.seek(lo * self.rec)
            raw = np.frombuffer(
                f.read((hi - lo + 1) * self.rec), dtype=np.uint8
            ).reshape(hi - lo + 1, self.rec)
        rows = raw[idx - lo]  # ranges are contiguous in practice; exact anyway
        dims = rows[:, :4].copy().view(np.int32).ravel()
        if not np.all(dims == self.dim):
            raise ValueError(f"{self.path}: inconsistent dimension header")
        mat = rows[:, 4:].copy().view(self.dtype).reshape(len(idx), self.dim)
        flat = pa.array(mat.reshape(-1), type=self.pa_type)
        emb = pa.FixedSizeListArray.from_arrays(flat, self.dim).cast(
            pa.list_(self.pa_type)
        )
        return pa.table(
            {
                "vec_id": pa.array(idx + self.id_offset, type=pa.int64()),
                "embedding": emb,
            }
        )


def read_vectors(
    path: str,
    kind: str | None = None,
    id_offset: int = 0,
    override_num_blocks: int | None = None,
):
    """Distributed (vec_id, embedding) Dataset over a TexMex vector
    file.  Fixed-size records -> each task seeks to its own range; on a
    cluster the file lives on shared storage, same as the parquet
    inputs."""
    import ray
    import ray.data

    kind, dim, rec, n = file_geometry(path, kind)
    _, _, pa_type = _KINDS[kind]
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa_type)),
                }
            )
        )
    if override_num_blocks is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        override_num_blocks = min(max(8, 2 * n_cpus), max(1, n // 1024) or 1)
    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        _RangeReader,
        fn_constructor_args=(path, kind, dim, rec, id_offset),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
        num_cpus=1,
    )
