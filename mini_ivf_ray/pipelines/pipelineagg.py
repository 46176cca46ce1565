"""Date histogram + pipeline aggregations: the ES ``date_histogram``
bucket aggregation with ``derivative`` / ``cumulative_sum`` /
``moving_fn`` pipeline aggregations computed on the reduced buckets.

ES pipeline aggregations run in the REDUCE phase — on the bucket
table produced by the sibling aggregation, never on raw documents.
This module keeps that exact split:

  * the distributed part is one combiner-first histogram pass (the
    events.windowed_agg pattern: per-block partial (type, bucket)
    count+sum, one small ``groupby`` exchange) — buckets are the only
    thing shuffled;
  * the pipeline part is vectorized driver math over the reduced
    bucket table — (types x buckets) rows, corpus-independent.

Bucket semantics (pinned):

  * per event_type the histogram is DENSIFIED between that series'
    first and last bucket (``min_doc_count=0`` inside the series
    extent, ES's default rendering of date_histogram gaps): empty
    buckets get n=0, sv=0.
  * ``deriv``   = sv - sv(previous bucket); NULL for the first bucket
    of each series (ES derivative emits nothing there).
  * ``cum_n``   = running int64 sum of n within the series
    (cumulative_sum — integer, exact).
  * ``mavg``    = trailing mean of sv over the last ``moving_window``
    buckets INCLUDING the current one (ES moving_fn with
    shift=window end at the current bucket), i.e. ROWS BETWEEN
    moving_window-1 PRECEDING AND CURRENT ROW.

Exactness: n/cum_n are integers; sv, deriv, mavg are float64 whose
operand sets are identical to the SQL window functions (densified
zero buckets included), matched under the driver's rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _dense_series(events_ds, window_sec: int) -> list[pd.DataFrame]:
    """The shared distributed stage: ONE combiner-first histogram pass
    (per-block (type, bucket) partials, one small groupby exchange)
    followed by per-series densification between each series' own
    extent — the reduced bucket tables every pipeline agg here runs
    on.  Returns one sorted, zero-filled frame per event_type."""
    from mini_ivf_ray.pipelines.events import _window_partials

    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(
        _window_partials,
        fn_kwargs={"window_sec": window_sec},
        batch_format="pyarrow",
        batch_size=8192,
    )
    buckets = (
        partials.groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv"))
        .to_pandas()
    )
    frames = []
    for et, g in buckets.groupby("event_type", sort=True):
        g = g.sort_values("window_start")
        lo, hi = int(g["window_start"].min()), int(g["window_start"].max())
        dense = pd.DataFrame(
            {"window_start": np.arange(lo, hi + 1, window_sec, dtype=np.int64)}
        )
        g = dense.merge(g, on="window_start", how="left")
        g["event_type"] = et
        g["n"] = g["n"].fillna(0).astype(np.int64)
        g["sv"] = g["sv"].fillna(0.0).astype(np.float64)
        frames.append(g)
    return frames


def date_histogram_pipeline(
    events_ds,
    window_sec: int = 3600,
    moving_window: int = 3,
) -> pa.Table:
    """(event_type, window_start, n, sv_r, deriv_r, cum_n, mavg_r):
    per-type densified time buckets with the three ES pipeline
    aggregations computed on the reduced bucket table."""
    if moving_window <= 0:
        raise ValueError(f"moving_window must be > 0, got {moving_window}")
    if window_sec <= 0:
        raise ValueError(f"window_sec must be > 0, got {window_sec}")
    frames = []
    for g in _dense_series(events_ds, window_sec):
        sv = g["sv"].to_numpy()
        deriv = np.empty(len(g), dtype=np.float64)
        deriv[0] = np.nan
        deriv[1:] = sv[1:] - sv[:-1]
        g["deriv"] = deriv
        g["cum_n"] = g["n"].cumsum().astype(np.int64)
        # trailing moving mean incl. current bucket
        w = moving_window
        csum = np.concatenate([[0.0], np.cumsum(sv)])
        idx = np.arange(len(sv))
        start = np.maximum(0, idx - w + 1)
        g["mavg"] = (csum[idx + 1] - csum[start]) / (idx - start + 1)
        frames.append(g)
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["event_type", "window_start", "n", "sv", "deriv",
                 "cum_n", "mavg"]
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "window_start": pa.array(
                out["window_start"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
            "sv_r": pa.array(
                np.round(out["sv"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
            "deriv_r": pa.array(
                np.round(out["deriv"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
            "cum_n": pa.array(
                out["cum_n"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
            "mavg_r": pa.array(
                np.round(out["mavg"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
        }
    )


def bucket_pipeline_extras(
    events_ds,
    window_sec: int = 3600,
    lag: int = 2,
    min_count: int = 2,
    size: int = 5,
) -> pa.Table:
    """The remaining ES pipeline-aggregation family over the same
    reduced bucket table: ``serial_diff`` (lag-k differencing),
    ``bucket_script`` (a per-bucket computed metric), then
    ``bucket_selector`` (drop buckets) and ``bucket_sort`` (order and
    truncate the survivors) — applied in EXACTLY that order, ES's
    declaration-order contract, pinned: serial_diff and the script see
    the FULL densified series (a selector cannot change a lag
    operand), the selector then drops rows, and the sort ranks only
    the survivors.

    Per event_type series:

      * ``sdiff``  = sv - sv(lag buckets earlier); NULL on each
        series' first ``lag`` buckets (ES serial_diff emits nothing
        there).
      * ``ratio``  = sv / n (bucket_script {sv, n -> sv / n});
        NULL where n == 0 (a densified gap has no script value —
        pinned rather than ES's script runtime error).
      * selector: keep buckets with n >= ``min_count`` (integer
        predicate — exact).
      * sort: survivors ranked by (round(sv, 4) DESC, window_start
        ASC), top ``size`` kept, 1-based ``rank`` emitted.  The sort
        key is the ROUNDED metric by design: sv is a float sum whose
        last ulp is combine-order-dependent, so the published sort
        key is the 4-decimal value both the engine and the SQL oracle
        rank on — determinism over ulp-luck.

    Distributed shape: identical to date_histogram_pipeline — one
    combiner-first histogram exchange; everything here is driver math
    over (types x buckets) reduced rows, corpus-independent.
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    if min_count < 0:
        raise ValueError(f"min_count must be >= 0, got {min_count}")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if window_sec <= 0:
        raise ValueError(f"window_sec must be > 0, got {window_sec}")
    frames = []
    for g in _dense_series(events_ds, window_sec):
        sv = g["sv"].to_numpy()
        n = g["n"].to_numpy()
        sdiff = np.full(len(g), np.nan)
        if len(g) > lag:
            sdiff[lag:] = sv[lag:] - sv[:-lag]
        g["sdiff"] = sdiff
        with np.errstate(divide="ignore", invalid="ignore"):
            g["ratio"] = np.where(n > 0, sv / np.maximum(n, 1), np.nan)
        g = g[g["n"] >= min_count].copy()
        if not len(g):
            continue
        key = np.round(g["sv"].to_numpy(), 4)
        order = np.lexsort((g["window_start"].to_numpy(), -key))[:size]
        g = g.iloc[order].copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        frames.append(g)
    cols = ["event_type", "window_start", "n", "sv", "sdiff", "ratio", "rank"]
    out = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=cols)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "window_start": pa.array(
                out["window_start"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
            "sv_r": pa.array(
                np.round(out["sv"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
            "sdiff_r": pa.array(
                np.round(out["sdiff"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
            "ratio_r": pa.array(
                np.round(out["ratio"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
            "rank": pa.array(
                out["rank"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
        }
    )


def bucket_sibling_stats(
    events_ds,
    window_sec: int = 3600,
    fractions: tuple = (0.25, 0.5, 0.75),
) -> pa.Table:
    """The ES SIBLING bucket pipeline aggregations — ``stats_bucket``
    (count / min / max / avg / sum, subsuming ``min_bucket`` /
    ``max_bucket`` / ``avg_bucket`` / ``sum_bucket``) and
    ``percentiles_bucket`` — computed per event_type over the SAME
    densified bucket series the per-bucket pipeline aggs consume
    (min_doc_count=0 inside the series extent, the family's pinned
    rendering).

    Exactness design: the per-bucket metric is carried as INTEGER
    CENTS (``round(sv * 100)`` — event values have two decimals, so
    the bucket sum's true value does too and the rounding recovers it
    exactly on both engine and SQL despite float ulp), making every
    sibling statistic integer-derived: min/max/percentile selection
    compares integers, sum is an int64 sum, and the only float ops
    are the final /100.0 and the avg division — identical operand
    sequences either side, no rounding luck anywhere.

    * ``min_key`` / ``max_key``: ES min_bucket/max_bucket return ALL
      keys achieving the extremum; pinned here to the FIRST
      (window_start ascending) plus the tie count ``min_keys`` /
      ``max_keys`` — the same information, hashable shape.
    * percentiles: the repo-wide exact-quantile rule (DuckDB
      quantile_disc — value at 1-indexed rank ceil(q*n) of the sorted
      bucket metrics), NOT ES's interpolation-free nearest-rank
      variant; documented divergence shared with price_quantiles.
    """
    import math

    if window_sec <= 0:
        raise ValueError(f"window_sec must be > 0, got {window_sec}")
    for q in fractions:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"fractions must be in (0, 1], got {q}")
    out_rows = []
    for g in _dense_series(events_ds, window_sec):
        et = g["event_type"].iloc[0]
        ws = g["window_start"].to_numpy()
        cents = np.round(g["sv"].to_numpy() * 100.0).astype(np.int64)
        nb = cents.size
        mn, mx = int(cents.min()), int(cents.max())
        row = {
            "event_type": et,
            "n_buckets": nb,
            "sum_v": int(cents.sum()) / 100.0,
            "avg_v": (int(cents.sum()) / 100.0) / float(nb),
            "min_v": mn / 100.0,
            "min_key": int(ws[cents == mn].min()),
            "min_keys": int((cents == mn).sum()),
            "max_v": mx / 100.0,
            "max_key": int(ws[cents == mx].min()),
            "max_keys": int((cents == mx).sum()),
        }
        s = np.sort(cents)
        for q in fractions:
            r = min(max(math.ceil(q * nb), 1), nb)
            row[f"p{int(round(q * 100))}"] = int(s[r - 1]) / 100.0
        out_rows.append(row)
    out_rows.sort(key=lambda r: r["event_type"])
    cols = {}
    if out_rows:
        for k in out_rows[0]:
            vals = [r[k] for r in out_rows]
            if k == "event_type":
                cols[k] = pa.array(vals, type=pa.string())
            elif k in ("n_buckets", "min_key", "min_keys", "max_key", "max_keys"):
                cols[k] = pa.array(vals, type=pa.int64())
            else:
                cols[k] = pa.array(
                    np.round(np.array(vals, dtype=np.float64), 4),
                    type=pa.float64(),
                )
    return pa.table(cols) if cols else pa.table({"event_type": pa.array([], type=pa.string())})


def normalize_buckets(events_ds, window_sec: int = 3600) -> pa.Table:
    """The ES ``normalize`` pipeline aggregation, two shipped methods
    per densified bucket: ``percent_of_sum`` (100 * v / series sum)
    and ``range_normalize`` aka rescale_0_1 ((v - min) / (max - min)).
    Integer-cents operands (bucket_sibling_stats' design) make both
    divisions bit-identical either side.  Degenerate series are
    pinned: a zero series sum -> percent_of_sum NULL, a constant
    series (max == min) -> rescale NULL (ES emits nothing there)."""
    if window_sec <= 0:
        raise ValueError(f"window_sec must be > 0, got {window_sec}")
    frames = []
    for g in _dense_series(events_ds, window_sec):
        cents = np.round(g["sv"].to_numpy() * 100.0).astype(np.int64)
        total = int(cents.sum())
        mn, mx = int(cents.min()), int(cents.max())
        g = g[["event_type", "window_start", "n"]].copy()
        g["pct_of_sum"] = (
            100.0 * cents.astype(np.float64) / float(total)
            if total != 0
            else np.nan
        )
        g["rescaled"] = (
            (cents - mn).astype(np.float64) / float(mx - mn)
            if mx != mn
            else np.nan
        )
        frames.append(g)
    cols = ["event_type", "window_start", "n", "pct_of_sum", "rescaled"]
    out = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=cols)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "window_start": pa.array(
                out["window_start"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
            "n": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
            "pct_r": pa.array(
                np.round(out["pct_of_sum"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
            "rescaled_r": pa.array(
                np.round(out["rescaled"].to_numpy(dtype=np.float64), 4),
                type=pa.float64(),
            ),
        }
    )


# ES auto_date_histogram's interval ladder, pinned to FIXED-second
# steps (ES mixes calendar units — 1M/3M/1y have variable lengths and
# would make the bucket arithmetic engine-dependent; the fixed ladder
# keeps the choice a pure function of two integers, SQL-replayable)
AUTO_LADDER = (
    1, 5, 10, 30, 60, 300, 600, 1800,
    3600, 10800, 43200, 86400, 604800,
)


def choose_auto_interval(min_epoch: int, max_epoch: int, target: int) -> int:
    """The SMALLEST ladder interval whose aligned bucket count
    (floor(max/i) - floor(min/i) + 1) fits ``target`` — ES
    auto_date_histogram's rounding-aware walk up the ladder; the top
    rung is used even when it still overflows (ES caps there too)."""
    if target < 1:
        raise ValueError(f"target must be >= 1, got {target}")
    for i in AUTO_LADDER:
        if (max_epoch // i) - (min_epoch // i) + 1 <= target:
            return i
    return AUTO_LADDER[-1]


def auto_date_histogram(events_ds, target_buckets: int = 20) -> pa.Table:
    """ES ``auto_date_histogram``: pick the interval from the ladder
    so the GLOBAL aligned bucket count fits ``target_buckets``, then
    histogram (event_type, window_start, n) at that interval.

    Two streamed passes: a (min, max) epoch combiner (slim per-block
    partials), then the family's combiner-first histogram exchange at
    the chosen interval.  The interval is a pure function of
    (min, max, target) — deterministic, replayed by the SQL oracle's
    ladder CASE.  Empty input returns an empty table."""
    from ray.data.aggregate import Max, Min, Sum

    from mini_ivf_ray.pipelines.events import _window_partials

    def mm_partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        if not ts.size:
            return pa.table(
                {"lo": pa.array([], type=pa.int64()),
                 "hi": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {"lo": pa.array([int(ts.min())], type=pa.int64()),
             "hi": pa.array([int(ts.max())], type=pa.int64())}
        )

    mm = (
        events_ds.map_batches(mm_partial, batch_format="pyarrow")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
    )
    if mm["lo"] is None:
        return pa.table(
            {
                "interval_sec": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "window_start": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    interval = choose_auto_interval(
        int(mm["lo"]), int(mm["hi"]), target_buckets
    )
    partials = events_ds.map_batches(
        _window_partials,
        fn_kwargs={"window_sec": interval},
        batch_format="pyarrow",
        batch_size=8192,
    )
    buckets = (
        partials.groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "window_start"])
    )
    return pa.table(
        {
            "interval_sec": pa.array(
                np.full(len(buckets), interval, dtype=np.int64),
                type=pa.int64(),
            ),
            "event_type": pa.array(buckets["event_type"], type=pa.string()),
            "window_start": pa.array(
                buckets["window_start"].to_numpy(dtype=np.int64),
                type=pa.int64(),
            ),
            "n": pa.array(
                buckets["n"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
        }
    )


def moving_percentiles_buckets(
    events_ds,
    window_sec: int = 3600,
    moving_window: int = 3,
    fractions: tuple = (0.25, 0.5, 0.75),
) -> pa.Table:
    """The ES ``moving_percentiles`` pipeline aggregation — per
    densified bucket, percentiles of the metric over the TRAILING
    ``moving_window`` buckets including the current one (the
    moving_fn frame), EXACT where ES wraps a TDigest sketch: bucket
    metrics are integer cents (bucket_sibling_stats' design) and each
    window holds <= moving_window integers, so the percentile is a
    direct order statistic under the repo's pinned quantile_disc rule
    (1-indexed rank ceil(q*n)) — replayed by the oracle's windowed
    quantile_disc, which DuckDB implements with the same rule.

    Same distributed shape as the rest of the family: ONE
    combiner-first histogram exchange; the windowed selection is
    (types x buckets x fractions) driver math, corpus-independent."""
    import math

    if moving_window <= 0:
        raise ValueError(f"moving_window must be > 0, got {moving_window}")
    if window_sec <= 0:
        raise ValueError(f"window_sec must be > 0, got {window_sec}")
    for q in fractions:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"fractions must be in (0, 1], got {q}")
    frames = []
    for g in _dense_series(events_ds, window_sec):
        cents = np.round(g["sv"].to_numpy() * 100.0).astype(np.int64)
        out = {f"p{int(round(q * 100))}": [] for q in fractions}
        for i in range(cents.size):
            w = np.sort(cents[max(0, i - moving_window + 1): i + 1])
            n = w.size
            for q in fractions:
                r = min(max(math.ceil(q * n), 1), n)
                out[f"p{int(round(q * 100))}"].append(int(w[r - 1]) / 100.0)
        g = g[["event_type", "window_start", "n"]].copy()
        for k, v in out.items():
            g[k] = v
        frames.append(g)
    cols = ["event_type", "window_start", "n"] + [
        f"p{int(round(q * 100))}" for q in fractions
    ]
    out = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=cols)
    )
    tbl = {
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "window_start": pa.array(
            out["window_start"].to_numpy(dtype=np.int64), type=pa.int64()
        ),
        "n": pa.array(out["n"].to_numpy(dtype=np.int64), type=pa.int64()),
    }
    for q in fractions:
        k = f"p{int(round(q * 100))}"
        tbl[k] = pa.array(
            np.round(out[k].to_numpy(dtype=np.float64), 4),
            type=pa.float64(),
        )
    return pa.table(tbl)
