"""Deterministic corpus splitting/sampling.

Training-data pipelines need REPRODUCIBLE splits: the same document
must land in the same train/val/test split on every run, on every
cluster size, regardless of block order — so the assignment must be a
pure function of the row, never of ``random()`` state or row position.
The canonical recipe is a salted content hash bucketed into permille
ranges (the salt versions the split).

md5 (not pandas siphash) is used deliberately: it is the one hash both
this engine and any SQL engine (DuckDB ``md5()``) can compute
bit-identically, so the split is auditable end-to-end — the driver
oracle replays the exact assignment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def split_bucket(doc_ids, salt: str) -> np.ndarray:
    """Permille bucket per id: first 60 bits of md5(f"{id}:{salt}") mod
    1000 (== first 15 hex chars as an int — the form a SQL auditor
    replays as ``('0x' || substr(md5(...), 1, 15))::UBIGINT``).  Pure,
    order-independent, salt-versioned."""
    md5 = hashlib.md5
    frombytes = int.from_bytes
    return np.fromiter(
        (
            (frombytes(md5(f"{int(i)}:{salt}".encode()).digest()[:8], "big") >> 4)
            % 1000
            for i in doc_ids
        ),
        dtype=np.int64,
        count=len(doc_ids),
    )


def stable_split(
    docs_ds,
    salt: str = "v1",
    train_permille: int = 980,
    val_permille: int = 990,
):
    """(doc_id, bucket, split): train if bucket < train_permille, val if
    < val_permille, else test.  Stateless map — no shuffle, no sort, no
    dependence on partitioning; safe to recompute anywhere at 100 TB."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = split_bucket(ids, salt)
        split = np.where(
            b < train_permille, "train", np.where(b < val_permille, "val", "test")
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(b, type=pa.int64()),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow")
