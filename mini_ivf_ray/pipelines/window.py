"""Keyed ordered-window functions over an event stream.

SQL-window-function semantics (``OVER (PARTITION BY key ORDER BY
ts, id)``) re-expressed Ray-Data-first: rows are bucketed by
``hash(key) % B`` (B scales with cluster CPUs), shuffled ONCE, and
each bucket computes every window column vectorized over its sorted
frame — no per-row Python, no per-user groups (a user's rows are
co-bucketed by construction, and group boundaries are handled with
boolean masks over the bucket-wide sort).

Emitted columns are all integer-exact (sequence numbers, lag deltas
in microseconds, running/rolling sums of ``floor(value)``), so the
DuckDB oracle comparison is bit-for-bit — no float-accumulation-order
traps (numpy pairwise/cumulative sums vs DuckDB's segment-tree window
aggregation would differ in ulps on double columns).

No reference analog (the reference is an ANN index); this belongs to
the task-brief's training-data-pipeline operator family, next to
events.py's tumbling/hopping/session windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_count(num_buckets: int | None) -> int:
    if num_buckets is not None:
        return num_buckets
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(32, 4 * n_cpus)


def keyed_window_funcs(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    roll_n: int = 3,
    num_buckets: int | None = None,
):
    """Per-key ordered window functions, one exchange total.

    Output rows (one per input event):
      key, id_col, ts_us   — identity + the total order (ts, id)
      seq                  — ROW_NUMBER() within the key
      delta_us             — ts gap to the previous event (-1 at head)
      run_vsum             — running sum of floor(value) (unbounded)
      roll_vsum            — rolling sum over the last ``roll_n`` rows
    """

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").view("int64")
        v = batch[value_col].to_numpy(zero_copy_only=False)
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            b = (k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(
                32
            )
        return pa.table(
            {
                key: pa.array(k),
                id_col: batch[id_col],
                "ts_us": pa.array(ts_us),
                "vfloor": pa.array(np.floor(v).astype(np.int64)),
                "bucket": pa.array((b % np.uint64(nb)).astype(np.int64)),
            }
        )

    nb = _bucket_count(num_buckets)

    def window_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key, "ts_us", id_col], kind="mergesort")
        k = g[key].to_numpy()
        ts = g["ts_us"].to_numpy()
        v = g["vfloor"].to_numpy()
        n = len(g)
        start = np.empty(n, dtype=bool)
        start[0] = True
        start[1:] = k[1:] != k[:-1]
        idx = np.arange(n, dtype=np.int64)
        grp_start = np.maximum.accumulate(np.where(start, idx, 0))
        seq = idx - grp_start + 1
        delta = np.empty(n, dtype=np.int64)
        delta[0] = -1
        delta[1:] = ts[1:] - ts[:-1]
        delta[start] = -1
        cums = np.cumsum(v)
        run = cums - cums[grp_start] + v[grp_start]
        # rolling sum over the last roll_n rows of the SAME key: global
        # shifts are safe because seq > j guards the group boundary
        roll = v.copy()
        for j in range(1, roll_n):
            roll[j:] += np.where(seq[j:] > j, v[:-j], 0)
        return pd.DataFrame(
            {
                key: k,
                id_col: g[id_col].to_numpy(),
                "ts_us": ts,
                "seq": seq,
                "delta_us": delta,
                "run_vsum": run,
                "roll_vsum": roll,
            }
        )

    return (
        events_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window_bucket, batch_format="pandas")
    )
