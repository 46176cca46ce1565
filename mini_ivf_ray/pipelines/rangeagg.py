"""Range aggregation: Elasticsearch ``range`` (and ``date_range``)
over the match set — per query, for an EXPLICIT list of named,
possibly-overlapping, possibly-open-ended value ranges, the count and
mean of a numeric per-document field over the matched docs falling in
each range.

What distinguishes this from the fixed-interval match histogram
(collapse.py's binned machinery): ranges are heterogeneous and MAY
OVERLAP — a doc is counted in EVERY range containing it (ES range-agg
semantics, ``from`` inclusive / ``to`` exclusive, either side open) —
so the kernel is k independent masks over the query's matched values,
not one bincount.

Scale shape: identical to extstats.py — the (doc_id, value) sidecar
is broadcast ONCE; the per-(query, range) partial is the additive
pair (n, sum), so doc-sharded serving (serving.ShardedIndex
.range_buckets over RangeSearcher.range_buckets_batch, pytest-pinned
bit-identical) ships (queries x ranges) slim integer rows per shard —
never doc-proportional.  Integer-valued fields keep sums below 2^53
=> exact in any combine order; avg = s / n is the one float64 op the
SQL oracle replays.

Semantics pinned (one divergence documented): a matched doc missing
the field lands in no range; a (query, range) bucket with zero docs
is OMITTED — the SQL GROUP BY shape and this repo's facet-panel
convention — where ES itself returns empty range buckets with
doc_count 0 (the caller knows the requested ranges; zero rows carry
no information).

Reference analogy: QueryObs bucket walk (index_ivfpq.cpp:412-470)
with caller-supplied bucket edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.extstats import ExtStatsSearcher

RANGE_COLUMNS = ["query_id", "range_key", "n_docs", "avg_v"]


def validate_ranges(ranges):
    """[(key, lo|None, hi|None)] -> normalized [(str, float, float)]
    with open ends as -inf/+inf; rejects empty/duplicate keys and
    lo >= hi loudly."""
    if not ranges:
        raise ValueError("range aggregation needs >= 1 range")
    out, seen = [], set()
    for key, lo, hi in ranges:
        key = str(key)
        if not key or key in seen:
            raise ValueError(f"empty or duplicate range key: {key!r}")
        seen.add(key)
        lo_f = -np.inf if lo is None else float(lo)
        hi_f = np.inf if hi is None else float(hi)
        if np.isnan(lo_f) or np.isnan(hi_f):
            raise ValueError(f"range {key!r}: NaN bound")
        if not (lo_f < hi_f):
            raise ValueError(f"range {key!r}: from {lo_f} must be < to {hi_f}")
        out.append((key, lo_f, hi_f))
    return out


def range_partials(values: np.ndarray, ranges) -> list[tuple[str, int, float]]:
    """The additive per-partition partial: for each named range, the
    (key, n, sum) over values with lo <= v < hi — zero-count ranges
    omitted.  k masks over the match values; a value can contribute
    to several overlapping ranges."""
    out = []
    for key, lo, hi in ranges:
        m = (values >= lo) & (values < hi)
        n = int(np.count_nonzero(m))
        if n:
            out.append((key, n, float(np.sum(values[m]))))
    return out


class RangeBucketSearcher(ExtStatsSearcher):
    """Actor-pool stage: (query_id, text) -> one (query_id, range_key,
    n_docs, avg_v) row per non-empty (query, range) bucket."""

    def __init__(self, *args, ranges=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.ranges = validate_ranges(ranges)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, keys, ns, avgs = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = self.disjunctive_matches_for_text(qtext)
            if not docs.size or not self.value_ids.size:
                continue
            idx = np.searchsorted(self.value_ids, docs)
            np.minimum(idx, self.value_ids.size - 1, out=idx)
            hit = self.value_ids[idx] == docs
            v = self.values[idx[hit]]
            for key, n, s in range_partials(v, self.ranges):
                qids.append(qid)
                keys.append(key)
                ns.append(n)
                avgs.append(s / n)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "range_key": pa.array(keys, type=pa.string()),
                "n_docs": pa.array(ns, type=pa.int64()),
                "avg_v": pa.array(avgs, type=pa.float64()),
            }
        )


def range_buckets_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    ranges,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, range_key, n_docs,
    avg_v) rows: the exact count and mean of the field over matched
    docs in each named range (from inclusive, to exclusive, open ends
    allowed, ranges may overlap — ES range-agg semantics).  Zero
    buckets omitted; the (doc_id, value) sidecar is broadcast ONCE."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ranges = validate_ranges(ranges)
    ids = np.asarray(value_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = np.asarray(values, dtype=np.float64)[order]
    if np.isnan(vals).any():
        raise ValueError(
            "values contains NaN; drop missing-field docs from the sidecar"
        )

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    import ray

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    values_ref = ray.put((ids, vals))
    return queries_ds.map_batches(
        RangeBucketSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={
            "denied_ref": denied_ref,
            "ranges": list(ranges),
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
