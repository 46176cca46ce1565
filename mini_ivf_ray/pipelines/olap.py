"""OLAP-style wide aggregates: pivot and rollup.

Both follow the repo's standard shuffle discipline: per-batch
combiners shrink rows to (key, partial-aggregate) BEFORE any exchange,
then ONE fixed-width bucketed groupby (CPU-scaled) finishes the
reduction — never a per-distinct-key groupby (one block per group) and
never a second pass over the input.

* ``pivot_counts`` — long->wide: one row per key with a count column
  per pivot value (SQL ``count(*) FILTER (WHERE col = v)``).  The
  pivot vocabulary must be given explicitly (fixed output schema, the
  same contract as SQL PIVOT ... IN (...)).
* ``rollup_agg`` — GROUP BY ROLLUP(d1, d2) over integer-exact
  aggregates.  The base (d1, d2) cells are produced distributed; the
  coarser levels ((d1, NULL) and (NULL, NULL)) re-aggregate the BASE
  CELLS, which are group-cardinality-sized, not corpus-sized — the
  classic rollup-from-cube-cells trick, so the input is read once.

No reference analog; task-brief training-data/warehouse family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _num_buckets(num_buckets: int | None) -> int:
    if num_buckets is not None:
        return num_buckets
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(32, 4 * n_cpus)


def pivot_counts(
    ds,
    key: str,
    pivot_col: str,
    pivot_values: list[str],
    num_buckets: int | None = None,
):
    """One row per ``key`` with ``n_<value>`` count columns.

    Per batch: factorize (key, pivot) and np.add.at into a dense
    (keys x values) matrix -> partial wide rows; unknown pivot values
    count into ``n_other``.  Exchange: one bucketed groupby, pandas
    sum inside."""
    nb = _num_buckets(num_buckets)
    val_cols = [f"n_{v}" for v in pivot_values]
    val_index = {v: i for i, v in enumerate(pivot_values)}

    def partials(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        p = batch[pivot_col].to_pylist()
        codes, uniq = pd.factorize(k)
        pcol = np.array([val_index.get(v, len(pivot_values)) for v in p])
        mat = np.zeros((len(uniq), len(pivot_values) + 1), dtype=np.int64)
        np.add.at(mat, (codes, pcol), 1)
        with np.errstate(over="ignore"):
            h = (
                np.asarray(uniq).astype(np.int64).view(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
            ) >> np.uint64(32)
        cols = {key: pa.array(np.asarray(uniq))}
        for i, c in enumerate(val_cols):
            cols[c] = pa.array(mat[:, i])
        cols["n_other"] = pa.array(mat[:, len(pivot_values)])
        cols["bucket"] = pa.array((h % np.uint64(nb)).astype(np.int64))
        return pa.table(cols)

    def reduce_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(key, sort=False, as_index=False)[
            val_cols + ["n_other"]
        ].sum()
        return out

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def rollup_agg(
    ds,
    dims: tuple[str, str],
    count_as: str = "n_rows",
    floor_sum_col: str | None = None,
    floor_sum_as: str = "sum_floor",
    num_buckets: int | None = None,
):
    """GROUP BY ROLLUP(d1, d2): rows for (d1, d2), (d1, NULL) and
    (NULL, NULL) levels.  Aggregates are integer-exact: COUNT(*) plus
    an optional SUM(floor(col)) (floor keeps float inputs exact and
    associative).  Base cells are computed distributed with per-batch
    combiners; the rollup levels re-aggregate those cells."""
    d1, d2 = dims
    nb = _num_buckets(num_buckets)

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                d1: batch[d1].to_pandas(),
                d2: batch[d2].to_pandas(),
            }
        )
        if floor_sum_col is not None:
            df["_v"] = np.floor(
                batch[floor_sum_col].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
        else:
            df["_v"] = 0
        g = df.groupby([d1, d2], sort=False)["_v"].agg(["count", "sum"]).reset_index()
        h = pd.util.hash_pandas_object(g[d1].astype(str), index=False).to_numpy()
        return pa.table(
            {
                d1: pa.array(g[d1]),
                d2: pa.array(g[d2]),
                count_as: pa.array(g["count"].to_numpy().astype(np.int64)),
                floor_sum_as: pa.array(g["sum"].to_numpy().astype(np.int64)),
                "bucket": pa.array(
                    (h.view(np.uint64) % np.uint64(nb)).astype(np.int64)
                ),
            }
        )

    def reduce_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # bucket is keyed on d1 only, so every (d1, *) cell AND the
        # (d1, NULL) level can be finished locally in this bucket
        base = group.groupby([d1, d2], sort=False, as_index=False)[
            [count_as, floor_sum_as]
        ].sum()
        lvl1 = base.groupby(d1, sort=False, as_index=False)[
            [count_as, floor_sum_as]
        ].sum()
        lvl1[d2] = None
        return pd.concat([base, lvl1[base.columns]], ignore_index=True)

    cells = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
    # grand total: one tiny driver-side reduction over the level-1
    # cells (group-cardinality-sized — memory pitfall #12: driver
    # reduce beats a shuffle for small aggregates)
    df = cells.to_pandas()
    lvl1 = df[df[d2].isna()]
    total = pd.DataFrame(
        {
            d1: [None],
            d2: [None],
            count_as: [int(lvl1[count_as].sum())],
            floor_sum_as: [int(lvl1[floor_sum_as].sum())],
        }
    )
    out = pd.concat([df, total[df.columns]], ignore_index=True)
    if floor_sum_col is None:
        out = out.drop(columns=[floor_sum_as])
    return out


def cube_agg(
    ds,
    dims: tuple[str, str],
    count_as: str = "n_rows",
    floor_sum_col: str | None = None,
    floor_sum_as: str = "sum_floor",
    num_buckets: int | None = None,
):
    """GROUP BY CUBE(d1, d2): rows for (d1, d2), (d1, NULL), (NULL, d2)
    and (NULL, NULL).  Same shuffle discipline as ``rollup_agg``: the
    base cells are produced distributed (per-batch combiners -> ONE
    bucketed groupby keyed on d1, which also finishes the (d1, NULL)
    level locally); the cross-bucket levels — (NULL, d2) and the grand
    total — re-aggregate the BASE CELLS on the driver, which are
    group-cardinality-sized, never corpus-sized.  Aggregates stay
    integer-exact (COUNT + SUM(floor(col))), so every engine computes
    bit-identical numbers regardless of accumulation order."""
    d1, d2 = dims
    roll = rollup_agg(
        ds,
        dims,
        count_as=count_as,
        floor_sum_col=floor_sum_col,
        floor_sum_as=floor_sum_as,
        num_buckets=num_buckets,
    )
    agg_cols = [count_as] + ([floor_sum_as] if floor_sum_col is not None else [])
    base = roll[roll[d1].notna() & roll[d2].notna()]
    lvl2 = base.groupby(d2, sort=False, as_index=False)[agg_cols].sum()
    lvl2[d1] = None
    return pd.concat([roll, lvl2[roll.columns]], ignore_index=True)


def pricing_summary(lineitem_ds, cutoff: str = "2000-12-01"):
    """TPC-H Q1 (pricing summary report) — the canonical combiner-first
    aggregate: per-batch partial sums per (returnflag, linestatus),
    one tiny driver reduce (<= groups x batches rows), zero shuffle.

    Money is accumulated as EXACT INTEGERS (pitfall: numpy round is
    half-even, DuckDB's half-away; float sums are order-dependent):
    prices as cents, discount/tax as hundredths, so
      sum_disc_e4   = sum(cents * (100 - disc_h))          [cents x 1e2]
      sum_charge_e6 = sum(cents * (100-disc_h) * (100+tax_h)) [cents x 1e4]
    are int64-exact (headroom: ~7e10 per row, ~1e8 rows before
    overflow — shard the reduce by group beyond that).  The avg_*
    columns are raw float64 divisions of those exact integers, so both
    engines produce bit-identical doubles."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    cut = np.datetime64(cutoff + "T00:00:00", "us")

    def partials(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch["l_shipdate"], pa.scalar(cut))
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table(
                {c: pa.array([], type=pa.string() if c in ("rf", "ls") else pa.int64())
                 for c in ("rf", "ls", "sum_qty", "sum_base_cents",
                           "sum_disc_e4", "sum_charge_e6", "sum_disc_h", "n")}
            )
        cents = np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_h = np.rint(b["l_discount"].to_numpy() * 100).astype(np.int64)
        tax_h = np.rint(b["l_tax"].to_numpy() * 100).astype(np.int64)
        qty = np.rint(b["l_quantity"].to_numpy()).astype(np.int64)
        df = pd.DataFrame(
            {
                "rf": b["l_returnflag"].to_pandas(),
                "ls": b["l_linestatus"].to_pandas(),
                "sum_qty": qty,
                "sum_base_cents": cents,
                "sum_disc_e4": cents * (100 - disc_h),
                "sum_charge_e6": cents * (100 - disc_h) * (100 + tax_h),
                "sum_disc_h": disc_h,
                "n": 1,
            }
        )
        out = df.groupby(["rf", "ls"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = lineitem_ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    if "rf" not in parts.columns or not len(parts):
        return pd.DataFrame()
    agg = parts.groupby(["rf", "ls"], sort=True).sum().reset_index()
    agg = agg.rename(columns={"rf": "l_returnflag", "ls": "l_linestatus",
                              "n": "count_order"})
    # raw float64 divisions of exact integers: bit-identical cross-engine
    agg["avg_qty"] = agg["sum_qty"].astype(np.float64) / agg["count_order"]
    agg["avg_price"] = (
        agg["sum_base_cents"].astype(np.float64) / 100.0 / agg["count_order"]
    )
    agg["avg_disc"] = (
        agg["sum_disc_h"].astype(np.float64) / 100.0 / agg["count_order"]
    )
    return agg
