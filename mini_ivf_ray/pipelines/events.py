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
    """Sessionize one bucket of users, fully vectorized: ONE sort of the
    bucket by (user, ts, event_id), session starts = user change OR
    gap > gap_sec, then per-session aggregates from the boundary
    indices (no per-user or per-session Python loop)."""
    empty = pd.DataFrame(
        {"user_id": [], "session_idx": [], "n_events": [], "start_ts": [], "end_ts": []}
    )
    if not len(group):
        return empty
    uid = group["user_id"].to_numpy().astype(np.int64)
    ts = group["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 1_000_000
    eid = group["event_id"].to_numpy()
    order = np.lexsort((eid, ts, uid))
    uid, ts = uid[order], ts[order]
    new = np.ones(len(uid), dtype=bool)
    new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_sec)
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(uid))
    sess_user = uid[starts]
    n_sess = len(starts)
    new_user = np.ones(n_sess, dtype=bool)
    new_user[1:] = sess_user[1:] != sess_user[:-1]
    first_of_user = np.maximum.accumulate(
        np.where(new_user, np.arange(n_sess), 0)
    )
    return pd.DataFrame(
        {
            "user_id": sess_user,
            "session_idx": np.arange(n_sess) - first_of_user,
            "n_events": ends - starts,
            "start_ts": ts[starts],
            "end_ts": ts[ends - 1],
        }
    )


def sessionize(events_ds, gap_sec: int = 1800, num_buckets: int | None = None):
    """Session windows per user (gap-based).  Users are hash-bucketed so
    the groupby has fixed cardinality; each bucket sessionizes its users
    with one vectorized pass.  ``num_buckets`` defaults to
    ``max(64, 8 x cluster CPUs)`` — per-task memory is ~1/B of the
    events table, so B is the scale knob (round-1's fixed 32 pinned one
    task at 1/32 of all events regardless of cluster size).  Ordering
    assumption: all events of a user share a bucket (holds by
    construction of the user-hash bucketing)."""
    if num_buckets is None:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(64, 8 * n_cpus)

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


def _hopping_partials(batch: pa.Table, window_sec: int, hop_sec: int) -> pa.Table:
    """Per-batch combiner for hopping windows: each event belongs to
    window_sec/hop_sec overlapping windows; replicas are pre-aggregated
    per (event_type, window_start) INSIDE the batch so the shuffle moves
    O(batches x windows x overlap), never O(events x overlap)."""
    ts = batch["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    k = window_sec // hop_sec
    # window starts covering t: hop-aligned s with s <= t < s + window
    last = ts // hop_sec * hop_sec
    parts = []
    for i in range(k):
        parts.append(last - i * hop_sec)
    starts = np.concatenate(parts)
    df = pd.DataFrame(
        {
            "event_type": np.tile(
                np.asarray(batch["event_type"].to_pylist(), dtype=object), k
            ),
            "window_start": starts,
            "n": 1,
            "sv": np.tile(batch["value"].to_numpy(), k),
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


def hopping_window_agg(events_ds, window_sec: int = 3600, hop_sec: int = 900):
    """Hopping (sliding) windows: count + sum(value) per event_type per
    hop-aligned window of length ``window_sec`` advancing by
    ``hop_sec`` (window_sec must divide by hop_sec).  Same two-level
    pre-aggregation shape as the tumbling ``windowed_agg``."""
    assert window_sec % hop_sec == 0, "window must be a multiple of hop"
    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(
        _hopping_partials,
        fn_kwargs={"window_sec": window_sec, "hop_sec": hop_sec},
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


# ---------------------------------------------------------------------------
# Per-window distinct users (exact COUNT DISTINCT under a shuffle combiner)
# ---------------------------------------------------------------------------


def _distinct_pair_rows(batch: pa.Table, window_sec: int, num_buckets: int) -> pa.Table:
    """Per-batch combiner: DISTINCT (window, user) pairs only — repeat
    events by the same user in the same window never enter the
    exchange.  Bucket key spreads sequential windows uniformly."""
    ts = batch["ts"].to_numpy()
    win = ts.astype("datetime64[s]").astype(np.int64) // window_sec * window_sec
    df = pd.DataFrame(
        {"window_start": win, "user_id": batch["user_id"].to_numpy()}
    ).drop_duplicates()
    bkey = (df["window_start"].to_numpy() // window_sec) % num_buckets
    return pa.table(
        {
            "bkey": pa.array(bkey.astype(np.int64), type=pa.int64()),
            "window_start": pa.array(df["window_start"].to_numpy(), type=pa.int64()),
            "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
        }
    )


def _bucket_nunique(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return pd.DataFrame(
            {
                "window_start": pd.Series(dtype=np.int64),
                "n_users": pd.Series(dtype=np.int64),
            }
        )
    g = df.groupby("window_start", sort=True)["user_id"].nunique()
    return pd.DataFrame(
        {
            "window_start": g.index.to_numpy(np.int64),
            "n_users": g.to_numpy(np.int64),
        }
    )


def distinct_users_per_window(events_ds, window_sec: int = 3600, num_buckets=None):
    """EXACT per-tumbling-window distinct-user counts.  All pairs of a
    window share a bucket, so the per-bucket nunique is globally exact;
    the exchange carries distinct (window, user) pairs, never raw
    events."""
    import ray

    if num_buckets is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        num_buckets = max(32, 4 * n_cpus)
    rows = events_ds.map_batches(
        _distinct_pair_rows,
        fn_kwargs={"window_sec": window_sec, "num_buckets": num_buckets},
        batch_format="pyarrow",
    )
    return rows.groupby("bkey").map_groups(_bucket_nunique, batch_format="pandas")
