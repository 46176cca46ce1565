"""Merge stage: stitch per-partition segments into the global dictionary.

Reference analog: ``posting_lists_lens`` + the per-cluster shard layout
(index_ivfpq.cpp:496-530) — the sidecar that tells a reader which shard
holds what.  Here the per-term physical layout after the salted build is
a set of disjoint docID-range runs across partitions; because runs are
range-salted, "merging into a globally sorted posting list" is pure
metadata: per term, the ordered location list (partitions sorted by
their run's first docID).  This stage materializes that as
``dictionary.parquet`` (term, df, cf, n_postings, n_blocks, locations),
computed distributedly: one metadata-read task per partition,
pre-aggregated per term in-partition, then a fixed-width hash-bucketed
groupby (never a per-term shuffle).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.state.manifest import partition_dir

_BUCKETS = 64
_DRIVER_MERGE_ROWS = 2_000_000


def _partition_term_meta(row, index_dir: str) -> pa.Table:
    """Per-partition task: read ONLY metadata columns (over EVERY
    segment file of the partition — base epoch + incremental-append
    ``postings_inc<k>`` files) and pre-aggregate per term.  df is NOT
    taken from the stored column (it bakes the encode epoch's global
    value, stale after an incremental append): one posting == one
    (term, doc), so the exact global df is the posting count summed
    across partitions and epochs — which ``_merge_terms`` computes."""
    from mini_ivf_ray.sources.segments import partition_segment_files

    p = int(row["pid"])
    files = partition_segment_files(index_dir, p)
    if not files:
        return pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "pid": pa.array([], type=pa.int64()),
                "cf": pa.array([], type=pa.int64()),
                "n_blocks": pa.array([], type=pa.int64()),
                "n_postings": pa.array([], type=pa.int64()),
                "min_first": pa.array([], type=pa.uint64()),
                "bucket": pa.array([], type=pa.int64()),
            }
        )
    t = pa.concat_tables(
        [
            pq.read_table(f, columns=["term", "cf", "count", "first_doc_id"])
            for f in files
        ]
    )
    df = pd.DataFrame(
        {
            "term": t["term"].to_pylist(),
            "cf": t["cf"].to_numpy(),
            "count": t["count"].to_numpy(),
            "first": t["first_doc_id"].to_numpy(),
        }
    )
    g = (
        df.groupby("term", sort=False)
        .agg(cf=("cf", "sum"), n_blocks=("count", "size"),
             n_postings=("count", "sum"), min_first=("first", "min"))
        .reset_index()
    )
    bucket = np.array(
        [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _BUCKETS
            for s in g["term"]
        ],
        dtype=np.int64,
    )
    return pa.table(
        {
            "term": pa.array(g["term"], type=pa.string()),
            "pid": pa.array(np.full(len(g), p, dtype=np.int64)),
            "cf": pa.array(g["cf"].to_numpy().astype(np.int64)),
            "n_blocks": pa.array(g["n_blocks"].to_numpy().astype(np.int64)),
            "n_postings": pa.array(g["n_postings"].to_numpy().astype(np.int64)),
            "min_first": pa.array(g["min_first"].to_numpy().astype(np.uint64)),
            "bucket": pa.array(bucket),
        }
    )


def _merge_terms(group: pd.DataFrame) -> pd.DataFrame:
    """Vectorized cross-partition term merge: one sort by
    (term, min_first), integer reduceat sums (exact), location lists via
    np.split at the term boundaries — no per-term Python loop.

    df == total posting count: one posting per (term, doc) across all
    partitions/epochs (the encoder raises on duplicates), so the summed
    n_postings IS the exact global document frequency — identical to
    the per-row df a single-epoch encode bakes, and correct when an
    incremental append makes those stale."""
    if not len(group):
        return pd.DataFrame(
            {"term": [], "df": [], "cf": [], "n_postings": [], "n_blocks": [],
             "locations": []}
        )
    codes, uniques = pd.factorize(group["term"], sort=True)
    order = np.lexsort((group["min_first"].to_numpy(), codes))
    codes_s = codes[order]
    starts = np.flatnonzero(
        np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
    )
    pid = group["pid"].to_numpy().astype(np.int64)[order]
    n_postings = np.add.reduceat(
        group["n_postings"].to_numpy()[order], starts
    ).astype(np.int64)
    # one partition may appear several times (one row per epoch): the
    # locations list keeps first occurrence in min_first order
    locs = [
        list(dict.fromkeys(a.tolist())) for a in np.split(pid, starts[1:])
    ]
    return pd.DataFrame(
        {
            "term": np.asarray(uniques, dtype=object)[codes_s[starts]],
            "df": n_postings,
            "cf": np.add.reduceat(group["cf"].to_numpy()[order], starts).astype(np.int64),
            "n_postings": n_postings,
            "n_blocks": np.add.reduceat(
                group["n_blocks"].to_numpy()[order], starts
            ).astype(np.int64),
            "locations": locs,
        }
    )


def build_dictionary(index_dir: str, num_partitions: int) -> str:
    """Distributed dictionary build; atomic write.  Returns path.

    The per-partition metadata reads always fan out as tasks; the
    cross-partition merge is ADAPTIVE: below ``_DRIVER_MERGE_ROWS``
    total term rows (known cheaply from the partition manifests) the
    merge happens driver-side in one pandas groupby — a Ray
    sort-exchange for a vocabulary-sized table costs a flat latency
    floor that dominated small-cluster scaling; above it, the
    fixed-width hash-bucketed groupby path shuffles as before."""
    import ray.data

    from mini_ivf_ray.state.manifest import read_partition_manifest

    total_terms = 0
    for p in range(num_partitions):
        try:
            total_terms += read_partition_manifest(index_dir, p)["counters"].get(
                "n_terms", 0
            )
        except FileNotFoundError:
            continue

    parts = ray.data.from_items(
        [{"pid": p} for p in range(num_partitions)],
        override_num_blocks=num_partitions,
    )

    def read_meta(batch: pa.Table) -> pa.Table:
        tables = [
            _partition_term_meta({"pid": p}, index_dir)
            for p in batch["pid"].to_pylist()
        ]
        return pa.concat_tables(tables)

    meta = parts.map_batches(read_meta, batch_format="pyarrow", batch_size=1)
    if total_terms <= _DRIVER_MERGE_ROWS:
        rows = list(meta.iter_batches(batch_format="pyarrow"))
        merged_df = (
            _merge_terms(
                pa.concat_tables(rows).to_pandas() if rows else
                pa.table({"term": pa.array([], type=pa.string()),
                          "pid": pa.array([], type=pa.int64()),
                          "df": pa.array([], type=pa.int64()),
                          "cf": pa.array([], type=pa.int64()),
                          "n_blocks": pa.array([], type=pa.int64()),
                          "n_postings": pa.array([], type=pa.int64()),
                          "min_first": pa.array([], type=pa.uint64()),
                          "bucket": pa.array([], type=pa.int64())}).to_pandas()
            )
        )
        batches = (
            [pa.Table.from_pandas(merged_df, preserve_index=False)]
            if len(merged_df)
            else []
        )
    else:
        merged = meta.groupby("bucket").map_groups(_merge_terms, batch_format="pandas")
        batches = list(merged.iter_batches(batch_format="pyarrow"))
    if batches:
        tbl = pa.concat_tables(batches, promote_options="default")
        order = pa.compute.sort_indices(tbl, sort_keys=[("term", "ascending")])
        tbl = tbl.take(order)
    else:  # empty corpus
        tbl = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "cf": pa.array([], type=pa.int64()),
                "n_postings": pa.array([], type=pa.int64()),
                "n_blocks": pa.array([], type=pa.int64()),
                "locations": pa.array([], type=pa.list_(pa.int64())),
            }
        )
    tmp = os.path.join(index_dir, "_dictionary.parquet.tmp")
    pq.write_table(tbl, tmp)
    final = os.path.join(index_dir, "dictionary.parquet")
    os.replace(tmp, final)
    return final


def load_dictionary(index_dir: str) -> pa.Table | None:
    path = os.path.join(index_dir, "dictionary.parquet")
    if not os.path.exists(path):
        return None
    return pq.read_table(path)
