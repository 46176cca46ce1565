"""Extended stats aggregation: Elasticsearch ``extended_stats`` over
the match set — count / min / max / sum / avg / sum_of_squares /
variance / std_deviation of a numeric per-document field, per query.

The textbook mergeable-moments aggregation: every partition of the
match set contributes a 5-tuple partial

    (n, sum, sum_of_squares, min, max)

and partials combine associatively (adds and min/max), so the
distributed shape is ONE slim (queries x shards) merge — never
doc-proportional — and the derived statistics are computed once,
driver-side, from the merged moments:

    avg      = sum / n
    variance = (sum_of_squares - sum * sum / n) / n      (population,
                ES's ``variance_population``)
    std      = sqrt(variance)

Exactness: over an integer-valued field (token/char counts, the
common case) float64 sums below 2^53 are EXACT regardless of
accumulation order, so engine, shard-merged, and SQL moments are
bit-equal, and the derived stats — computed by the identical float64
op sequence on both sides — hash-match under the driver's rounding.
For genuinely fractional fields the sums are order-sensitive at the
last ulp like any parallel sum; the driver rounds to 4 decimals.

ES semantics pinned here: a matched doc MISSING the field is skipped
(contributes to no moment, not even ``count``); a query whose match
set carries no field values emits NO row (the SQL GROUP BY shape).

Scale shape: identical to facets.py — the (doc_id, value) sidecar is
broadcast ONCE via ``ray.put`` in the single-index path, and in
doc-sharded serving (serving.ShardedIndex.ext_stats) each shard holds
only its range's slice and ships one moments row per (query, shard).

Reference analogy: the per-query histogram walk of QueryObs
(index_ivfpq.cpp:412-470), reduced to moments instead of buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.facets import FacetCounter
from mini_ivf_ray.pipelines.query import BM25Searcher

STAT_COLUMNS = [
    "query_id", "n_docs", "min_v", "max_v", "sum_v", "sumsq_v",
    "avg_v", "variance", "std_dev",
]


def derived_stats(n: int, s: float, ss: float) -> tuple[float, float, float]:
    """(avg, population variance, std) from merged moments — the ONE
    float64 op sequence both the SQL oracle and every serving path
    replay (change both or neither)."""
    avg = s / n
    var = (ss - s * s / n) / n
    # guard the tiny negative a cancellation can leave at n==1 etc.
    var = var if var > 0.0 else 0.0
    return avg, var, float(np.sqrt(var))


class ExtStatsSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> one extended-stats row per
    query over the disjunctive match set's field values."""

    # the canonical match-set walk, shared with the facet panel
    disjunctive_matches_for_text = FacetCounter.disjunctive_matches_for_text

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        values_ref=None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, vals = (
            ray.get(values_ref)
            if isinstance(values_ref, ray.ObjectRef)
            else values_ref
        )
        self.value_ids = np.asarray(ids, dtype=np.uint64)
        self.values = np.asarray(vals, dtype=np.float64)
        if self.value_ids.size > 1 and not np.all(
            self.value_ids[:-1] < self.value_ids[1:]
        ):
            raise ValueError("value sidecar must be sorted by unique doc_id")

    def moments_for_text(self, qtext: str):
        """(n, sum, sumsq, min, max) over the match set's field values,
        or None when no matched doc carries the field."""
        docs = self.disjunctive_matches_for_text(qtext)
        if not docs.size or not self.value_ids.size:
            return None
        idx = np.searchsorted(self.value_ids, docs)
        np.minimum(idx, self.value_ids.size - 1, out=idx)
        hit = self.value_ids[idx] == docs
        v = self.values[idx[hit]]
        if not v.size:
            return None
        return (
            int(v.size),
            float(np.sum(v)),
            float(np.sum(v * v)),
            float(np.min(v)),
            float(np.max(v)),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {c: [] for c in STAT_COLUMNS}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            m = self.moments_for_text(qtext)
            if m is None:
                continue
            n, s, ss, lo, hi = m
            avg, var, std = derived_stats(n, s, ss)
            rows["query_id"].append(qid)
            rows["n_docs"].append(n)
            rows["min_v"].append(lo)
            rows["max_v"].append(hi)
            rows["sum_v"].append(s)
            rows["sumsq_v"].append(ss)
            rows["avg_v"].append(avg)
            rows["variance"].append(var)
            rows["std_dev"].append(std)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
                **{
                    c: pa.array(rows[c], type=pa.float64())
                    for c in STAT_COLUMNS[2:]
                },
            }
        )


def ext_stats_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> one (query_id, n_docs, min_v, max_v,
    sum_v, sumsq_v, avg_v, variance, std_dev) row per query over the
    disjunctive match set; matched docs missing the field are skipped,
    empty-stat queries emit no row (ES extended_stats semantics).  The
    (doc_id, value) sidecar is broadcast ONCE (``ray.put``)."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(value_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = np.asarray(values, dtype=np.float64)[order]
    if np.isnan(vals).any():
        raise ValueError(
            "values contains NaN; drop missing-field docs from the "
            "sidecar instead (they are skipped by construction)"
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
        ExtStatsSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class PercentileRanksSearcher(ExtStatsSearcher):
    """ES ``percentile_ranks`` over the match set: for each requested
    threshold value v, the percent of field-carrying matched docs with
    value <= v (the inverse of the percentiles aggregation, exact —
    no sketch).  Same sidecar, same match walk as extended stats; the
    per-threshold count is one searchsorted against the query's SORTED
    match values, so k thresholds cost O(k log n) after the walk.

    Mergeable the same way: per-shard (n, count<=v per threshold)
    partials are additive, so the sharded analog ships (1 + k)
    integers per (query, shard) — WIRED: ShardedIndex.pct_ranks /
    RangeSearcher.pct_ranks_batch, pytest-pinned bit-identical."""

    def __init__(self, *args, thresholds=None, **kwargs):
        super().__init__(*args, **kwargs)
        t = np.asarray(
            thresholds if thresholds is not None else [], dtype=np.float64
        )
        if not t.size:
            raise ValueError("percentile_ranks needs >= 1 threshold value")
        if np.isnan(t).any():
            raise ValueError("thresholds contain NaN")
        self.thresholds = t

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, vals, pcts, ns = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = self.disjunctive_matches_for_text(qtext)
            if not docs.size or not self.value_ids.size:
                continue
            idx = np.searchsorted(self.value_ids, docs)
            np.minimum(idx, self.value_ids.size - 1, out=idx)
            hit = self.value_ids[idx] == docs
            v = np.sort(self.values[idx[hit]])
            if not v.size:
                continue
            n = float(v.size)
            below = np.searchsorted(v, self.thresholds, side="right")
            for t, c in zip(self.thresholds.tolist(), below.tolist()):
                qids.append(qid)
                vals.append(t)
                pcts.append(100.0 * float(c) / n)
                ns.append(int(n))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "value": pa.array(vals, type=pa.float64()),
                "pct": pa.array(pcts, type=pa.float64()),
                "n_docs": pa.array(ns, type=pa.int64()),
            }
        )


def percentile_ranks_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    thresholds,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> one (query_id, value, pct, n_docs)
    row per (query, threshold): the exact percent of field-carrying
    matched docs with field value <= threshold.  Empty-stat queries
    emit no rows (the extstats contract)."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
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
        PercentileRanksSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={
            "denied_ref": denied_ref,
            "thresholds": list(thresholds),
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class GroupedMetricSearcher(ExtStatsSearcher):
    """ES ``terms`` aggregation ORDERED BY a metric sub-aggregation
    (e.g. "top languages by average document length within these
    results"): per query, group the match set by a label sidecar,
    compute each group's (count, sum) over a value sidecar, and emit
    the top ``num_buckets`` groups by (avg desc, label asc).

    ES warns this ordering is inexact under shard-local top-N bucket
    pruning; here every shard's per-group (n, sum) partials are SLIM —
    (queries x group-cardinality) rows, group cardinality panel-sized
    by definition — so the merge keeps ALL groups and the ordering is
    EXACT (the documented fix ES suggests via larger shard_size, free
    at this shape).  Integer-valued fields make the sums order-exact
    (the extstats argument).

    Carries BOTH sidecars: (doc_id, code) labels (facets machinery)
    and (doc_id, float64) values (extstats machinery)."""

    def __init__(
        self,
        index_dir: str,
        cfg=None,
        shared_tables=None,
        decoded_refs=None,
        values_ref=None,
        labels_ref=None,
        labels: list[str] | None = None,
        num_buckets: int = 3,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, values_ref,
            denied_ref=denied_ref,
        )
        import ray

        ids, codes = (
            ray.get(labels_ref)
            if isinstance(labels_ref, ray.ObjectRef)
            else labels_ref
        )
        self.label_ids = np.asarray(ids, dtype=np.uint64)
        self.label_codes = np.asarray(codes, dtype=np.int64)
        self.labels = list(labels or [])
        if num_buckets < 1:
            raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
        self.num_buckets = int(num_buckets)
        if self.label_ids.size > 1 and not np.all(
            self.label_ids[:-1] < self.label_ids[1:]
        ):
            raise ValueError("label sidecar must be sorted by unique doc_id")

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, facets, ns, avgs = [], [], [], []
        k = len(self.labels)
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = self.disjunctive_matches_for_text(qtext)
            if not docs.size or not self.value_ids.size or not k:
                continue
            # docs carrying BOTH the label and the value
            li = np.searchsorted(self.label_ids, docs)
            np.minimum(li, self.label_ids.size - 1, out=li)
            has_l = self.label_ids[li] == docs
            vi = np.searchsorted(self.value_ids, docs)
            np.minimum(vi, self.value_ids.size - 1, out=vi)
            has_v = self.value_ids[vi] == docs
            both = has_l & has_v
            if not both.any():
                continue
            codes = self.label_codes[li[both]]
            vals = self.values[vi[both]]
            n = np.bincount(codes, minlength=k).astype(np.float64)
            s = np.bincount(codes, weights=vals, minlength=k)
            present = np.flatnonzero(n > 0)
            avg = s[present] / n[present]
            # (avg desc, label asc) top num_buckets
            names = [self.labels[int(c)] for c in present]
            order = sorted(
                range(len(present)), key=lambda i: (-avg[i], names[i])
            )[: self.num_buckets]
            for i in order:
                qids.append(qid)
                facets.append(names[i])
                ns.append(int(n[present[i]]))
                avgs.append(float(avg[i]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "facet": pa.array(facets, type=pa.string()),
                "n_docs": pa.array(ns, type=pa.int64()),
                "avg_v": pa.array(avgs, type=pa.float64()),
            }
        )


def grouped_metric_top(
    index_dir: str,
    queries_ds,
    label_ids,
    label_values,
    value_ids,
    values,
    cfg: PipelineConfig | None = None,
    num_buckets: int = 3,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> top ``num_buckets`` (query_id,
    facet, n_docs, avg_v) groups of the match set by (avg desc, facet
    asc) over a numeric field — ES terms-agg ordered by a metric
    sub-agg, exact (no shard-local bucket pruning).  Docs must carry
    BOTH sidecars to contribute."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    lids = np.asarray(label_ids, dtype=np.uint64)
    lorder = np.argsort(lids, kind="stable")
    lids = lids[lorder]
    lvals = pa.array(
        np.asarray(label_values, dtype=object)[lorder], type=pa.string()
    )
    if lvals.null_count:
        raise ValueError(
            f"label_values contains {lvals.null_count} null(s); "
            "map nulls to a sentinel label first"
        )
    enc = pa.compute.dictionary_encode(lvals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    vids = np.asarray(value_ids, dtype=np.uint64)
    vorder = np.argsort(vids, kind="stable")
    vids = vids[vorder]
    vvals = np.asarray(values, dtype=np.float64)[vorder]
    if np.isnan(vvals).any():
        raise ValueError("values contains NaN; drop missing-field docs")

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
    return queries_ds.map_batches(
        GroupedMetricSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={
            "values_ref": ray.put((vids, vvals)),
            "labels_ref": ray.put((lids, codes)),
            "labels": labels,
            "num_buckets": num_buckets,
            "denied_ref": denied_ref,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def merge_moments(parts) -> dict[int, tuple[int, float, float, float, float]]:
    """Associatively combine per-shard (query_id, n, sum, sumsq, min,
    max) partial rows into one moments tuple per query — the driver
    side of the doc-sharded path (queries x shards rows in, queries
    rows out)."""
    merged: dict[int, tuple[int, float, float, float, float]] = {}
    for qid, n, s, ss, lo, hi in parts:
        cur = merged.get(int(qid))
        if cur is None:
            merged[int(qid)] = (int(n), float(s), float(ss), float(lo), float(hi))
        else:
            merged[int(qid)] = (
                cur[0] + int(n),
                cur[1] + float(s),
                cur[2] + float(ss),
                min(cur[3], float(lo)),
                max(cur[4], float(hi)),
            )
    return merged
