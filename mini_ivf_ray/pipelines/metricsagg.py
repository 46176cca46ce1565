"""Weighted-average and top-metrics aggregations: Elasticsearch
``weighted_avg`` and ``top_metrics`` over the match set.

``weighted_avg``: per query, sum(value * weight) / sum(weight) over
matched docs — the weight-corrected mean ES ships for "average price
weighted by sales volume" panels.  The partial is the additive pair

    (n, sum_w, sum_vw)

so the distributed shape is the extstats one: ONE slim row per
(query, shard), merged by plain addition, with the single division
done once driver-side (the SQL oracle replays the identical float64
op).  Over integer-valued fields with v*w sums below 2^53 the float64
adds are exact in any combine order, so single-pass, shard-merged,
and SQL results are bit-equal.  The sharded path needs NO new actor
code: RangeSearcher.matrix_batch's co-moments already carry
sum_y (= sum_w, with y the weight field) and sum_xy (= sum_vw), so
ShardedIndex.weighted_avg is a thin derive over the existing partials.

ES semantics pinned here:

  * a matched doc contributes only when it carries BOTH the value and
    the weight field (ES skips the doc when either is missing and no
    ``missing`` default is configured — none is here);
  * weights are validated >= 0 at the driver (a negative weight turns
    the "average" into an extrapolation; ES's scripted callers guard
    the same way) and a query whose weights sum to 0 emits NO row
    (ES returns null; a row-less table is this repo's convention for
    null aggregates, same as extstats' empty-match rule);
  * a query with no both-fields matches emits NO row.

``top_metrics``: per query, the ``size`` best documents by a numeric
SORT field (descending, doc_id-ascending tiebreak — the engine's
canonical deterministic order) with their METRIC field values — ES's
"metrics of the top-sorted hits" aggregation.  The distributed shape
is the top-k one: each doc lives in exactly one shard's sidecar
slice, a global top-``size`` row is necessarily its home shard's
local top-``size`` row, so shards ship (queries x size) slim rows and
the driver re-cuts under the identical key — exact, never
doc-proportional.  One divergence, documented: ES returns null for a
top doc missing the metric field; here the both-fields rule applies
(a doc missing the metric is not in the sidecar and cannot be a top
hit), consistent with matrix_stats/weighted_avg.

Reference analogy: the QueryObs per-query histogram walk
(index_ivfpq.cpp:412-470) reduced to a weighted first moment /
a per-query k-selection over sidecar values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.matrix import MatrixStatsSearcher

WEIGHTED_COLUMNS = ["query_id", "n_docs", "sum_w", "sum_vw", "weighted_avg"]
TOP_METRICS_COLUMNS = ["query_id", "rank", "doc_id", "sort_v", "metric_v"]


def derived_weighted(sw: float, svw: float) -> float:
    """weighted_avg from merged partials — the ONE float64 division
    every serving path and the SQL oracle replay."""
    return svw / sw


class WeightedAvgSearcher(MatrixStatsSearcher):
    """Actor-pool stage: (query_id, text) -> one weighted-avg row per
    query; x = value field, y = weight field of the joined sidecar."""

    def weighted_for_text(self, qtext: str):
        """(n, sum_w, sum_vw) over the match set's both-fields docs,
        or None when nothing contributes or weights sum to zero."""
        docs = self.disjunctive_matches_for_text(qtext)
        if not docs.size or not self.xy_ids.size:
            return None
        idx = np.searchsorted(self.xy_ids, docs)
        np.minimum(idx, self.xy_ids.size - 1, out=idx)
        hit = self.xy_ids[idx] == docs
        sel = idx[hit]
        if not sel.size:
            return None
        w = self.y[sel]
        sw = float(np.sum(w))
        if sw == 0.0:
            return None
        return int(sel.size), sw, float(np.sum(self.x[sel] * w))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {c: [] for c in WEIGHTED_COLUMNS}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            m = self.weighted_for_text(qtext)
            if m is None:
                continue
            n, sw, svw = m
            rows["query_id"].append(qid)
            rows["n_docs"].append(n)
            rows["sum_w"].append(sw)
            rows["sum_vw"].append(svw)
            rows["weighted_avg"].append(derived_weighted(sw, svw))
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
                "sum_w": pa.array(rows["sum_w"], type=pa.float64()),
                "sum_vw": pa.array(rows["sum_vw"], type=pa.float64()),
                "weighted_avg": pa.array(
                    rows["weighted_avg"], type=pa.float64()
                ),
            }
        )


def top_metrics_rows(docs, sort_v, metric_v, size: int):
    """The deterministic (sort desc, doc asc) top-``size`` cut — the
    ONE ordering rule the single pass, the sharded re-merge, and the
    SQL oracle's window all replay.  Returns (docs, sort_v, metric_v)
    slices in rank order."""
    order = np.lexsort((docs, -sort_v))[:size]
    return docs[order], sort_v[order], metric_v[order]


class TopMetricsSearcher(MatrixStatsSearcher):
    """Actor-pool stage: (query_id, text) -> up to ``size`` rows per
    query; x = sort field, y = metric field of the joined sidecar."""

    def __init__(self, *args, size: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        if size < 1:
            raise ValueError(f"size must be >= 1, got {size}")
        self.size = int(size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {c: [] for c in TOP_METRICS_COLUMNS}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = self.disjunctive_matches_for_text(qtext)
            if not docs.size or not self.xy_ids.size:
                continue
            idx = np.searchsorted(self.xy_ids, docs)
            np.minimum(idx, self.xy_ids.size - 1, out=idx)
            hit = self.xy_ids[idx] == docs
            sel = idx[hit]
            if not sel.size:
                continue
            d, sv, mv = top_metrics_rows(
                self.xy_ids[sel], self.x[sel], self.y[sel], self.size
            )
            for r in range(d.size):
                rows["query_id"].append(qid)
                rows["rank"].append(r + 1)
                rows["doc_id"].append(int(d[r]))
                rows["sort_v"].append(float(sv[r]))
                rows["metric_v"].append(float(mv[r]))
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "rank": pa.array(rows["rank"], type=pa.int64()),
                # doc ids are md5-u64 in the url-keyed path: uint64
                "doc_id": pa.array(rows["doc_id"], type=pa.uint64()),
                "sort_v": pa.array(rows["sort_v"], type=pa.float64()),
                "metric_v": pa.array(rows["metric_v"], type=pa.float64()),
            }
        )


def _launch(searcher_cls, index_dir, queries_ds, x_ids, x_vals, y_ids,
            y_vals, cfg, share, respect_deletes, **ctor_kwargs):
    from mini_ivf_ray.pipelines.matrix import join_xy

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids, x, y = join_xy(x_ids, x_vals, y_ids, y_vals)

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
    xy_ref = ray.put((ids, x, y))
    return queries_ds.map_batches(
        searcher_cls,
        fn_constructor_args=(index_dir, cfg, shared, decoded, xy_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref, **ctor_kwargs},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def weighted_avg_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    weight_ids,
    weights,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> one (query_id, n_docs, sum_w,
    sum_vw, weighted_avg) row per query over the disjunctive match
    set; only docs carrying BOTH fields contribute, zero-total-weight
    and empty queries emit no row (ES weighted_avg semantics — see
    module docstring).  Weights validated >= 0 here, loudly."""
    w = np.asarray(weights, dtype=np.float64)
    if (w < 0).any():
        raise ValueError(
            f"{int((w < 0).sum())} negative weight(s); weighted_avg "
            "requires non-negative weights"
        )
    return _launch(
        WeightedAvgSearcher, index_dir, queries_ds,
        value_ids, values, weight_ids, w, cfg, share, respect_deletes,
    )


def top_metrics_search(
    index_dir: str,
    queries_ds,
    sort_ids,
    sort_vals,
    metric_ids,
    metric_vals,
    size: int = 3,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> up to ``size`` (query_id, rank,
    doc_id, sort_v, metric_v) rows per query: the match set's best
    docs by (sort_v desc, doc_id asc) with their metric values (ES
    top_metrics; both-fields contribution rule, module docstring)."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    return _launch(
        TopMetricsSearcher, index_dir, queries_ds,
        sort_ids, sort_vals, metric_ids, metric_vals, cfg, share,
        respect_deletes, size=size,
    )
