"""Composite aggregation: the ES ``composite`` agg — keyset-paginated
groupby buckets with an ``after`` cursor.

A terms/facet aggregation over a high-cardinality composite key cannot
return all buckets at once; ES pages them in key order: each page is
the next ``page_size`` buckets whose key sorts strictly AFTER the
cursor, and the last key of a page is the next page's ``after``.
Walking pages therefore enumerates every bucket exactly once — the
aggregation analog of search_after (no deep-offset scan, resumable
mid-stream).

Scale shape (two streamed passes, no all-groups shuffle):

  1. **Page-key discovery** — per block: filter rows to key > after,
     take the block's ``page_size`` smallest DISTINCT keys.  The
     global page keys are the smallest ``page_size`` of the union of
     per-block candidates (a key can only be globally smallest-N if it
     is smallest-N in every block that contains it), so the driver
     merges (blocks x page_size) slim key rows — never the full group
     cardinality.
  2. **Metric fill** — broadcast the page's keys (<= page_size rows);
     per block: inner-join rows to the page keys, partial-aggregate
     (count + sums) per key.  The driver combines (blocks x
     page_size) partial rows with one integer groupby-sum; at larger
     fan-in the same partials feed a distributed ``groupby(keys)``
     combiner (the sig_terms convention).

Exactness: counts and integer sums are exact in any combine order;
bucket membership is a string-tuple comparison, identical to the SQL
oracle's row-value ``(k1, k2) > (a1, a2)``.  A cursor past the last
key returns an empty page with the full schema (ES: no buckets, no
after_key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _after_mask(df: pd.DataFrame, keys: list[str], after: tuple) -> np.ndarray:
    """Vectorized lexicographic ``key > after`` over string columns."""
    mask = np.zeros(len(df), dtype=bool)
    tie = np.ones(len(df), dtype=bool)
    for col, av in zip(keys, after):
        v = df[col].to_numpy()
        mask |= tie & (v > av)
        tie &= v == av
    return mask


def composite_page(
    ds,
    keys: list[str],
    page_size: int,
    after: tuple | None = None,
    sum_cols: list[str] | None = None,
) -> pa.Table:
    """One page of the composite aggregation over ``ds``: the next
    ``page_size`` buckets in key order strictly after ``after``,
    each with ``doc_count`` and ``sum_<col>`` metrics."""
    keys = list(keys)
    sum_cols = list(sum_cols or [])
    if page_size <= 0:
        raise ValueError(f"page_size must be > 0, got {page_size}")
    if after is not None and len(after) != len(keys):
        raise ValueError(
            f"after must have one value per key ({len(keys)}), "
            f"got {len(after)}"
        )

    key_schema = pa.schema([(k, pa.string()) for k in keys])
    out_schema = pa.schema(
        [(k, pa.string()) for k in keys]
        + [("doc_count", pa.int64())]
        + [(f"sum_{c}", pa.int64()) for c in sum_cols]
    )

    def discover(batch: pa.Table) -> pa.Table:
        df = batch.select(keys).to_pandas()
        if after is not None:
            df = df[_after_mask(df, keys, after)]
        cand = (
            df.drop_duplicates()
            .sort_values(keys, kind="mergesort")
            .head(page_size)
        )
        # explicit string schema: an all-filtered block must not emit
        # null-typed columns (schema unification) and an empty page
        # must keep its columns
        return pa.Table.from_pandas(
            cand, preserve_index=False, schema=key_schema
        )

    cand = ds.map_batches(discover, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return out_schema.empty_table()
    page_keys = (
        cand.drop_duplicates()
        .sort_values(keys, kind="mergesort")
        .head(page_size)
        .reset_index(drop=True)
    )

    import ray

    keys_ref = ray.put(page_keys)

    class Fill:
        def __init__(self):
            self.page_keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.select(keys + sum_cols).to_pandas()
            hit = df.merge(self.page_keys, on=keys, how="inner")
            if not len(hit):
                return pa.Table.from_pandas(
                    pd.DataFrame(
                        {
                            **{k: pd.Series(dtype=object) for k in keys},
                            "doc_count": pd.Series(dtype=np.int64),
                            **{
                                f"sum_{c}": pd.Series(dtype=np.int64)
                                for c in sum_cols
                            },
                        }
                    ),
                    preserve_index=False,
                )
            agg = hit.groupby(keys, as_index=False).agg(
                doc_count=(keys[0], "size"),
                **{f"sum_{c}": (c, "sum") for c in sum_cols},
            )
            for c in sum_cols:
                agg[f"sum_{c}"] = agg[f"sum_{c}"].astype(np.int64)
            agg["doc_count"] = agg["doc_count"].astype(np.int64)
            return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(
        Fill, batch_format="pyarrow", concurrency=(1, 8)
    ).to_pandas()
    out = (
        partials.groupby(keys, as_index=False)
        .sum()
        .sort_values(keys, kind="mergesort")
        .reset_index(drop=True)
    )
    out["doc_count"] = out["doc_count"].astype(np.int64)
    for c in sum_cols:
        out[f"sum_{c}"] = out[f"sum_{c}"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False).cast(out_schema)
