"""Exact distributed quantiles over a float column — multi-pass
histogram-refinement selection (distributed quickselect), never a
global sort.

``grouped_dl_quantiles`` (analysis.py) covers integer-domain columns,
where a (group, value) histogram is exact and small.  Float columns
have unbounded distinct values, so the histogram trick alone is
data-sized in the worst case; classic selection networks instead
narrow a VALUE INTERVAL per target rank over a handful of passes:

  pass 0   (n, min, max) combiner
  pass i   fixed-width bin counts inside each target's current
           interval (all targets share one ``map_batches`` pass; the
           exchange is the per-batch NONZERO (target, bin, n) rows ->
           one small groupby, exactly the dl-histogram discipline)
  final    intervals now hold <= fetch_threshold values; filter-fetch
           them in one pass and select exactly

At 10^12 rows with 4096 bins the interval count shrinks ~4096x per
pass, so three histogram passes reach a fetchable interval — O(1)
passes, each streaming, driver state O(targets x bins).  The selected
values are exact order statistics (DuckDB quantile_disc rule: value at
1-indexed rank ceil(q*n)), so results are engine-order-independent.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _min_max_count(ds, col: str):
    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not v.size:
            return pa.table(
                {
                    "n": pa.array([0], type=pa.int64()),
                    "lo": pa.array([np.inf], type=pa.float64()),
                    "hi": pa.array([-np.inf], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "n": pa.array([v.size], type=pa.int64()),
                "lo": pa.array([float(v.min())], type=pa.float64()),
                "hi": pa.array([float(v.max())], type=pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # an empty dataset can yield zero blocks -> a column-less frame
    n = int(parts["n"].sum()) if "n" in parts.columns else 0
    if n == 0:
        return 0, math.nan, math.nan
    return n, float(parts["lo"].min()), float(parts["hi"].max())


class _Target:
    """One rank being narrowed: rank is 1-indexed WITHIN the sorted
    values of [lo, hi] (both ends inclusive), which holds ``count``
    values."""

    __slots__ = ("frac", "rank", "lo", "hi", "count", "value")

    def __init__(self, frac, rank, lo, hi, count):
        self.frac, self.rank = frac, rank
        self.lo, self.hi, self.count = lo, hi, count
        self.value: float | None = None


def _edges(lo: float, hi: float, bins: int) -> np.ndarray:
    e = np.unique(np.linspace(lo, hi, bins + 1))
    return e  # >= 2 entries whenever lo < hi


def exact_quantiles(
    ds,
    col: str,
    fractions=(0.25, 0.5, 0.75, 0.9, 0.99),
    bins: int = 4096,
    fetch_threshold: int = 100_000,
    max_passes: int = 40,
):
    """(frac, rank, value) — exact quantile_disc order statistics of
    ``ds[col]`` (NaNs ignored, DuckDB semantics).  ``fetch_threshold``
    bounds the single driver-side fetch; every other pass moves only
    bin counts."""
    n, gmin, gmax = _min_max_count(ds, col)
    fracs = list(fractions)
    if n == 0:
        return pa.table(
            {
                "frac": pa.array(fracs, type=pa.float64()),
                "rank": pa.array([0] * len(fracs), type=pa.int64()),
                "value": pa.array([None] * len(fracs), type=pa.float64()),
            }
        )
    targets = [
        _Target(q, min(max(math.ceil(q * n), 1), n), gmin, gmax, n)
        for q in fracs
    ]
    for t in targets:
        if t.lo == t.hi:  # constant column
            t.value = t.lo

    for _ in range(max_passes):
        active = [
            t
            for t in targets
            if t.value is None and t.count > fetch_threshold
        ]
        if not active:
            break
        spans = [(t.lo, t.hi, _edges(t.lo, t.hi, bins)) for t in active]

        def hist_partial(batch: pa.Table, spans=spans) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            ti, bi, cn = [], [], []
            for k, (lo, hi, edges) in enumerate(spans):
                w = v[(v >= lo) & (v <= hi)]
                if not w.size:
                    continue
                # half-open bins [e_i, e_{i+1}), last bin closed at hi
                idx = np.searchsorted(edges[1:-1], w, side="right")
                counts = np.bincount(idx, minlength=edges.size - 1)
                nz = np.flatnonzero(counts)
                ti.append(np.full(nz.size, k, dtype=np.int64))
                bi.append(nz.astype(np.int64))
                cn.append(counts[nz].astype(np.int64))
            if not ti:
                return pa.table(
                    {
                        "t": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "t": pa.array(np.concatenate(ti)),
                    "b": pa.array(np.concatenate(bi)),
                    "n": pa.array(np.concatenate(cn)),
                }
            )

        from ray.data.aggregate import Sum

        hist = (
            ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["t", "b"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values(["t", "b"], kind="mergesort")
        )
        for k, t in enumerate(active):
            g = hist[hist["t"] == k]
            edges = spans[k][2]
            counts = np.zeros(edges.size - 1, dtype=np.int64)
            counts[g["b"].to_numpy()] = g["n"].to_numpy()
            cum = counts.cumsum()
            b = int(np.searchsorted(cum, t.rank))
            prev = int(cum[b - 1]) if b else 0
            new_lo = float(edges[b])
            new_hi = float(edges[b + 1]) if b + 1 < edges.size else t.hi
            new_count = int(counts[b])
            if new_count == t.count and new_lo == t.lo and new_hi == t.hi:
                # interval no longer splits (values within a few ULPs):
                # fall through to the exact fetch regardless of size —
                # the distinct-value set in a ULP-narrow interval is
                # tiny even when the row count is not
                t.count = fetch_threshold
            else:
                t.rank -= prev
                t.lo, t.hi, t.count = new_lo, new_hi, new_count

    pending = [t for t in targets if t.value is None]
    if pending:
        spans = [(t.lo, t.hi) for t in pending]

        def fetch_partial(batch: pa.Table, spans=spans) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            ti, vals = [], []
            for k, (lo, hi) in enumerate(spans):
                w = v[(v >= lo) & (v <= hi)]
                if w.size:
                    # per-batch distinct-value counts keep the fetch
                    # bounded even for heavy-duplicate columns
                    u, c = np.unique(w, return_counts=True)
                    ti.append((np.full(u.size, k, dtype=np.int64), u, c))
            if not ti:
                return pa.table(
                    {
                        "t": pa.array([], type=pa.int64()),
                        "v": pa.array([], type=pa.float64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "t": pa.array(np.concatenate([x[0] for x in ti])),
                    "v": pa.array(np.concatenate([x[1] for x in ti])),
                    "n": pa.array(
                        np.concatenate([x[2] for x in ti]).astype(np.int64)
                    ),
                }
            )

        from ray.data.aggregate import Sum

        got = (
            ds.map_batches(fetch_partial, batch_format="pyarrow")
            .groupby(["t", "v"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values(["t", "v"], kind="mergesort")
        )
        for k, t in enumerate(pending):
            g = got[got["t"] == k]
            cum = g["n"].to_numpy().cumsum()
            if cum.size == 0 or cum[-1] < t.rank:
                raise AssertionError(
                    f"quantile interval lost rank {t.rank} (frac {t.frac})"
                )
            t.value = float(g["v"].to_numpy()[np.searchsorted(cum, t.rank)])

    ranks = [min(max(math.ceil(q * n), 1), n) for q in fracs]
    return pa.table(
        {
            "frac": pa.array(fracs, type=pa.float64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "value": pa.array([t.value for t in targets], type=pa.float64()),
        }
    )


def exact_quantiles_local(values: np.ndarray, fractions) -> pd.DataFrame:
    """Driver-side ground truth for tests (same quantile_disc rule)."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    v = v[~np.isnan(v)]
    rows = []
    for q in fractions:
        r = min(max(math.ceil(q * v.size), 1), v.size)
        rows.append((q, r, float(v[r - 1])))
    return pd.DataFrame(rows, columns=["frac", "rank", "value"])
