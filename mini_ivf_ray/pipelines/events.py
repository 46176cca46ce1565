"""Stream-shaped operators over the ``events`` table.

The reference is strictly batch (SURVEY §2.9: no windows/watermarks), so
these are additions in the training-data-pipeline spirit: event logs are
treated as an ordered, partitioned table and windows become groupbys
over derived window keys (ray_guide "Streaming-shaped workloads").

``windowed_agg`` demonstrates the pre-aggregation discipline: the
per-batch combiner emits one row per (event_type, window) per batch, so
the groupby shuffles O(batches x windows), never O(events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _window_partials(batch: pa.Table, window_sec: int) -> pa.Table:
    ts = batch["ts"].to_numpy()  # datetime64[us]
    win = ts.astype("datetime64[s]").astype(np.int64) // window_sec * window_sec
    df = pd.DataFrame(
        {
            "event_type": batch["event_type"].to_pylist(),
            "window_start": win,
            "n": 1,
            "sv": batch["value"].to_numpy(),
        }
    )
    g = (
        df.groupby(["event_type", "window_start"], sort=False)
        .agg(n=("n", "sum"), sv=("sv", "sum"))
        .reset_index()
    )
    return pa.table(
        {
            "event_type": pa.array(g["event_type"], type=pa.string()),
            "window_start": pa.array(g["window_start"].to_numpy(), type=pa.int64()),
            "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
            "sv": pa.array(g["sv"].to_numpy(), type=pa.float64()),
        }
    )


def windowed_agg(events_ds, window_sec: int = 3600):
    """Tumbling-window count + sum(value) per event_type.
    Returns (event_type, window_start epoch-sec, n, sv_r)."""
    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(
        _window_partials,
        fn_kwargs={"window_sec": window_sec},
        batch_format="pyarrow",
        batch_size=8192,
    )
    out = (
        partials.groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "window_start": pa.array(out["window_start"].to_numpy(), type=pa.int64()),
            "n": pa.array(out["n"].to_numpy(), type=pa.int64()),
            "sv_r": pa.array(np.round(out["sv"].to_numpy(), 4), type=pa.float64()),
        }
    )


def _session_rows(group: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    """Sessionize one bucket of users: events sorted by ts; a gap >
    gap_sec starts a new session (classic stateful-stream op expressed
    as sorted-group iteration)."""
    out = []
    for uid, g in group.groupby("user_id", sort=False):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 1_000_000
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_sec
        sess = np.cumsum(new) - 1
        for s in range(sess[-1] + 1 if len(sess) else 0):
            m = sess == s
            out.append(
                {
                    "user_id": int(uid),
                    "session_idx": int(s),
                    "n_events": int(m.sum()),
                    "start_ts": int(ts[m][0]),
                    "end_ts": int(ts[m][-1]),
                }
            )
    return pd.DataFrame(out) if out else pd.DataFrame(
        {"user_id": [], "session_idx": [], "n_events": [], "start_ts": [], "end_ts": []}
    )


def sessionize(events_ds, gap_sec: int = 1800, num_buckets: int = 32):
    """Session windows per user (gap-based).  Users are hash-bucketed so
    the groupby has fixed cardinality; each bucket sessionizes its users
    from sorted events.  Ordering assumption: all events of a user fit
    in one group (holds by construction of the bucketing)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy().astype(np.uint64) % np.uint64(num_buckets)).astype(
            np.int64
        )
        return batch.append_column("bucket", pa.array(b))

    return (
        events_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_session_rows, fn_kwargs={"gap_sec": gap_sec}, batch_format="pandas")
    )
