"""Matrix stats aggregation: Elasticsearch ``matrix_stats`` over the
match set — per query, the joint second-order statistics of TWO
numeric per-document fields: count, means, population variances,
covariance, and Pearson correlation.

The co-moments generalization of extstats.py's mergeable moments:
every partition of the match set contributes a 6-tuple partial

    (n, sum_x, sum_y, sum_xx, sum_yy, sum_xy)

and partials combine by plain addition, so the distributed shape is
ONE slim (queries x shards) merge — never doc-proportional — with the
derived statistics computed once, driver-side, by the fixed float64
op sequence in :func:`derived_matrix` (the SQL oracle replays the
identical expressions; change both or neither):

    mean  = s / n
    var   = (s2 - s * s / n) / n          (population, like extstats)
    cov   = (sxy - sx * sy / n) / n
    corr  = cov / sqrt(var_x * var_y)     (0.0 when either var == 0 —
                                           a constant field correlates
                                           with nothing)

Exactness: over integer-valued fields (char/token counts) with
x*y sums below 2^53, float64 adds are exact in ANY order, so engine,
shard-merged, and SQL moments are bit-equal and the derived stats
hash-match under the driver's rounding.

ES semantics pinned here, one divergence documented:

  * a matched doc contributes ONLY if it carries BOTH fields (ES
    matrix_stats excludes docs missing any requested field unless a
    ``missing`` default is given — none is here);
  * a query with no both-fields matches emits NO row;
  * divergence: ES also reports skewness/kurtosis; those need 3rd/4th
    raw moments whose sums overflow 2^53 at web-scale integer fields
    (order-sensitive float adds => not bit-mergeable), so this analog
    stops at the second order — the covariance/correlation matrix the
    aggregation is named for.

Scale shape: the two (doc_id, value) inputs are intersected ONCE into
a single (doc_id, x, y) sidecar (sorted-merge, same cost class as
building either sidecar), broadcast once via ``ray.put`` in the
single-index path; doc-sharded serving (serving.ShardedIndex
.matrix_stats over RangeSearcher.matrix_batch, pytest-pinned
bit-identical) holds 1/R of it per shard and ships one co-moments row
per (query, shard).

Reference analogy: the QueryObs per-query histogram walk
(index_ivfpq.cpp:412-470) reduced to joint moments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.facets import FacetCounter
from mini_ivf_ray.pipelines.query import BM25Searcher

MATRIX_COLUMNS = [
    "query_id", "n_docs", "mean_x", "mean_y", "var_x", "var_y",
    "cov_xy", "corr_xy",
]


def join_xy(x_ids, x_vals, y_ids, y_vals):
    """Sorted intersect of two (doc_id, value) sidecars into ONE
    (doc_id, x, y) sidecar holding exactly the docs carrying BOTH
    fields (the matrix_stats contribution rule).  Rejects NaNs and
    duplicate ids loudly."""
    xi = np.asarray(x_ids, dtype=np.uint64)
    xo = np.argsort(xi, kind="stable")
    xi, xv = xi[xo], np.asarray(x_vals, dtype=np.float64)[xo]
    yi = np.asarray(y_ids, dtype=np.uint64)
    yo = np.argsort(yi, kind="stable")
    yi, yv = yi[yo], np.asarray(y_vals, dtype=np.float64)[yo]
    for name, ids in (("x", xi), ("y", yi)):
        if ids.size > 1 and not np.all(ids[:-1] < ids[1:]):
            raise ValueError(f"{name} sidecar has duplicate doc_ids")
    if np.isnan(xv).any() or np.isnan(yv).any():
        raise ValueError(
            "sidecar values contain NaN; drop missing-field docs "
            "instead (they are excluded by construction)"
        )
    common, ix, iy = np.intersect1d(
        xi, yi, assume_unique=True, return_indices=True
    )
    return common, xv[ix], yv[iy]


def co_moments(x: np.ndarray, y: np.ndarray):
    """(n, sx, sy, sxx, syy, sxy) — the additive partial."""
    return (
        int(x.size),
        float(np.sum(x)),
        float(np.sum(y)),
        float(np.sum(x * x)),
        float(np.sum(y * y)),
        float(np.sum(x * y)),
    )


def derived_matrix(n, sx, sy, sxx, syy, sxy):
    """(mean_x, mean_y, var_x, var_y, cov, corr) from merged
    co-moments — the ONE float64 op sequence every serving path and
    the SQL oracle replay."""
    mean_x = sx / n
    mean_y = sy / n
    var_x = (sxx - sx * sx / n) / n
    var_x = var_x if var_x > 0.0 else 0.0
    var_y = (syy - sy * sy / n) / n
    var_y = var_y if var_y > 0.0 else 0.0
    cov = (sxy - sx * sy / n) / n
    vv = var_x * var_y
    corr = cov / float(np.sqrt(vv)) if vv > 0.0 else 0.0
    return mean_x, mean_y, var_x, var_y, cov, corr


def merge_comoments(parts) -> dict[int, tuple]:
    """Associatively combine (query_id, n, sx, sy, sxx, syy, sxy)
    partial rows — the driver side of the doc-sharded path (queries x
    shards rows in, queries rows out); plain adds, exact in any order
    for integer-valued fields below 2^53."""
    merged: dict[int, list] = {}
    for qid, *m in parts:
        cur = merged.get(int(qid))
        if cur is None:
            merged[int(qid)] = [int(m[0])] + [float(v) for v in m[1:]]
        else:
            cur[0] += int(m[0])
            for i in range(1, 6):
                cur[i] += float(m[i])
    return {q: tuple(v) for q, v in merged.items()}


class MatrixStatsSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> one matrix-stats row per
    query over the disjunctive match set's (x, y) pairs."""

    disjunctive_matches_for_text = FacetCounter.disjunctive_matches_for_text

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        xy_ref=None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, x, y = (
            ray.get(xy_ref) if isinstance(xy_ref, ray.ObjectRef) else xy_ref
        )
        self.xy_ids = np.asarray(ids, dtype=np.uint64)
        self.x = np.asarray(x, dtype=np.float64)
        self.y = np.asarray(y, dtype=np.float64)
        if self.xy_ids.size > 1 and not np.all(
            self.xy_ids[:-1] < self.xy_ids[1:]
        ):
            raise ValueError("xy sidecar must be sorted by unique doc_id")

    def comoments_for_text(self, qtext: str):
        """The additive 6-tuple over the match set's both-fields docs,
        or None when no matched doc carries both fields."""
        docs = self.disjunctive_matches_for_text(qtext)
        if not docs.size or not self.xy_ids.size:
            return None
        idx = np.searchsorted(self.xy_ids, docs)
        np.minimum(idx, self.xy_ids.size - 1, out=idx)
        hit = self.xy_ids[idx] == docs
        sel = idx[hit]
        if not sel.size:
            return None
        return co_moments(self.x[sel], self.y[sel])

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {c: [] for c in MATRIX_COLUMNS}
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            m = self.comoments_for_text(qtext)
            if m is None:
                continue
            n = m[0]
            mean_x, mean_y, var_x, var_y, cov, corr = derived_matrix(*m)
            rows["query_id"].append(qid)
            rows["n_docs"].append(n)
            rows["mean_x"].append(mean_x)
            rows["mean_y"].append(mean_y)
            rows["var_x"].append(var_x)
            rows["var_y"].append(var_y)
            rows["cov_xy"].append(cov)
            rows["corr_xy"].append(corr)
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
                **{
                    c: pa.array(rows[c], type=pa.float64())
                    for c in MATRIX_COLUMNS[2:]
                },
            }
        )


def matrix_stats_search(
    index_dir: str,
    queries_ds,
    x_ids,
    x_vals,
    y_ids,
    y_vals,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> one (query_id, n_docs, mean_x,
    mean_y, var_x, var_y, cov_xy, corr_xy) row per query over the
    disjunctive match set; only docs carrying BOTH fields contribute,
    empty queries emit no row (ES matrix_stats semantics minus
    skewness/kurtosis — see module docstring).  The joined (doc_id,
    x, y) sidecar is broadcast ONCE (``ray.put``)."""
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
        MatrixStatsSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, xy_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
