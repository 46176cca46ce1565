"""Resumable partitioned Parquet sink for arbitrary datasets.

The task brief's output contract — "write partitioned Parquet (one
directory per key range) so a failed run can skip finished
partitions; never one giant file" — generalized from the index
builder's per-partition commit protocol (state/manifest.py,
pipelines/build.py) to ANY table:

* rows are routed by ``hash(key) % num_partitions`` (same siphash-style
  mixing as the joins, so string keys work);
* ONE bucketed exchange groups each partition on one task, which
  sorts its rows deterministically and writes ``part=N/data.parquet``
  via tmp-file + atomic ``os.replace`` — a retried task rewrites the
  identical bytes, a finished partition is never touched again;
* a per-partition ``_SUCCESS.json`` (row count + key) marks the
  commit; ``write_partitioned`` skips partitions whose marker exists,
  so a crashed run resumes by redoing only the missing partitions;
* ``read_partitioned`` reads back only committed partitions and
  refuses a sink with missing markers (no silent partial reads).

At cluster scale each partition task holds ~1/P of the table — P is
the memory/parallelism knob, exactly like the join bucket count.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_STRIDE = np.uint64(0x9E3779B97F4A7C15)


def _part_hash(key: np.ndarray) -> np.ndarray:
    if key.dtype.kind in ("i", "u"):
        with np.errstate(over="ignore"):
            return (key.astype(np.int64).view(np.uint64) * _STRIDE) >> np.uint64(16)
    # strings / objects: stable content hash of the utf-8 bytes
    s = pd.util.hash_pandas_object(pd.Series(key), index=False).to_numpy()
    return s.view(np.uint64)


def _success_path(path: str, p: int) -> str:
    return os.path.join(path, f"part={p}", "_SUCCESS.json")


def committed_parts(path: str, num_partitions: int) -> set[int]:
    return {
        p for p in range(num_partitions) if os.path.exists(_success_path(path, p))
    }


def write_partitioned(
    ds,
    path: str,
    key: str,
    num_partitions: int = 32,
    sort_cols: list[str] | None = None,
):
    """Write ``ds`` as ``path/part=N/data.parquet``; returns the set of
    partitions written THIS call (committed ones are skipped)."""
    os.makedirs(path, exist_ok=True)
    done = committed_parts(path, num_partitions)
    pending = sorted(set(range(num_partitions)) - done)
    if not pending:
        return set()
    pend = np.zeros(num_partitions, dtype=bool)
    pend[pending] = True

    def route(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        pid = (_part_hash(k) % np.uint64(num_partitions)).astype(np.int64)
        out = batch.append_column("_pid", pa.array(pid))
        # resume filter BEFORE the exchange: rows of committed
        # partitions never leave the read task (same trick as the
        # build's pending-partition filter)
        return out.filter(pa.array(pend[pid]))

    def write_part(group: pd.DataFrame) -> pd.DataFrame:
        p = int(group["_pid"].iloc[0])
        body = group.drop(columns=["_pid"])
        order = sort_cols if sort_cols else [key]
        body = body.sort_values(order, kind="mergesort").reset_index(drop=True)
        pdir = os.path.join(path, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        marker = {"partition": p, "rows": int(len(body)), "key": key}
        mtmp = os.path.join(pdir, ".success.tmp")
        with open(mtmp, "w") as f:
            json.dump(marker, f)
        os.replace(mtmp, _success_path(path, p))
        return pd.DataFrame({"partition": [p], "rows": [len(body)]})

    stats = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("_pid")
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    written = set(int(p) for p in stats["partition"])
    # empty partitions get their marker too (hash gaps are normal), so
    # a resume can tell "done, zero rows" from "not attempted"
    for p in pending:
        if p not in written:
            pdir = os.path.join(path, f"part={p}")
            os.makedirs(pdir, exist_ok=True)
            mtmp = os.path.join(pdir, ".success.tmp")
            with open(mtmp, "w") as f:
                json.dump({"partition": p, "rows": 0, "key": key}, f)
            os.replace(mtmp, _success_path(path, p))
            written.add(p)
    return written


def read_partitioned(path: str, num_partitions: int | None = None):
    """Dataset over a committed sink.  Raises if any partition marker
    is missing (a partial sink must be resumed, not half-read)."""
    import ray.data

    parts = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("part=")
    )
    if num_partitions is None:
        num_partitions = (max(parts) + 1) if parts else 0
    missing = sorted(set(range(num_partitions)) - committed_parts(path, num_partitions))
    if missing:
        raise ValueError(
            f"{path}: partitions {missing[:8]}{'…' if len(missing) > 8 else ''} "
            "uncommitted — resume write_partitioned first"
        )
    files = [
        os.path.join(path, f"part={p}", "data.parquet")
        for p in range(num_partitions)
        if os.path.exists(os.path.join(path, f"part={p}", "data.parquet"))
    ]
    # partitioning=None: the hive-style dir names are our layout, not
    # a virtual column
    return ray.data.read_parquet(files, partitioning=None)
