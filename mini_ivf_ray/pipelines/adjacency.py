"""Adjacency-matrix aggregation: the Elasticsearch ``adjacency_matrix``
aggregation — over each query's match set, exact doc counts for every
named filter AND every pairwise filter intersection ("how do my
segments overlap inside these results", the co-occurrence panel
behind graph/venn UIs).

Filters here are single-term queries (the common case; ES allows any
query per filter).  For filters f1..fk and a query match set M:

    bucket(fi)      = |M  ∩ D(fi)|          (diagonal)
    bucket(fi & fj) = |M ∩ D(fi) ∩ D(fj)|   (i < j, key "fi&fj")

computed as ONE integer matmul: B is the (k x |M|) membership matrix
(row i = which match-set docs contain filter term i, a searchsorted
mask against fi's postings doc ids), and C = B @ B.T is the full
bucket matrix — diagonal the per-filter counts, off-diagonal the
intersections, exactly ES's output (zero-count buckets omitted, keys
joined with '&' in filter order, like ES's sorted compound keys).

Scale shape: per query the work is O(k x |M|) membership + a (k x k)
matmul — filter postings come from the same partition-selective
reader as query terms, no sidecar, no broadcast beyond the filter
term list.  The bucket matrix is ADDITIVE across disjoint doc ranges,
so doc-sharded serving ships one k x k integer matrix per (query,
shard) and the merge is a sum — the extstats.py moments argument,
matrix-shaped (integer counts: exact in any order).  WIRED:
serving.ShardedIndex.adjacency_buckets / RangeSearcher.adjacency_batch,
pytest-pinned bit-identical to this single-index path.

Reference analogy: QueryObs' per-cluster hit histogram
(index_ivfpq.cpp:412-470) — a per-query histogram over the match set,
here over filter-membership pairs instead of clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.facets import FacetCounter
from mini_ivf_ray.pipelines.query import BM25Searcher, _allowed_mask


def validate_filters(filters: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """(name, term_text) filters: names unique, no '&' (it is the
    compound-key separator), each text exactly one token."""
    names = [n for n, _ in filters]
    if len(set(names)) != len(names):
        raise ValueError(f"filter names must be unique, got {names}")
    out = []
    for name, text in filters:
        if "&" in name:
            raise ValueError(f"filter name may not contain '&': {name!r}")
        toks = tokenize(text)
        if len(toks) != 1:
            raise ValueError(
                f"filter {name!r} must be a single term, got {text!r}"
            )
        out.append((name, toks[0]))
    return out


def bucket_rows(
    names: list[str], mat: np.ndarray
) -> list[tuple[str, int]]:
    """(key, count) rows from a bucket matrix, ES layout: diagonal
    first-order keys, upper-triangle 'a&b' intersections, zero counts
    omitted, rows in (filter order, then pair order)."""
    rows = []
    k = len(names)
    for i in range(k):
        if mat[i, i]:
            rows.append((names[i], int(mat[i, i])))
    for i in range(k):
        for j in range(i + 1, k):
            if mat[i, j]:
                rows.append((f"{names[i]}&{names[j]}", int(mat[i, j])))
    return rows


class AdjacencySearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> (query_id, key, n_docs)
    adjacency buckets over the disjunctive match set."""

    disjunctive_matches_for_text = FacetCounter.disjunctive_matches_for_text

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        filters: list[tuple[str, str]] | None = None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        self.filters = validate_filters(list(filters or []))
        # filter postings fetched ONCE per actor (they are query-
        # independent), kept as sorted doc-id arrays
        self.filter_docs: list[np.ndarray] = []
        for _name, term in self.filters:
            if self.stats.df.get(term, 0) <= 0:
                self.filter_docs.append(np.empty(0, dtype=np.uint64))
                continue
            wanted = {term: self.stats.term_locations(term, self.cfg)}
            b = self.reader.fetch_terms(wanted).get(term)
            if b is None or not b.n_blocks:
                self.filter_docs.append(np.empty(0, dtype=np.uint64))
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            self.filter_docs.append(b.all_postings()[0])

    def buckets_for_text(self, qtext: str) -> np.ndarray:
        """The k x k bucket matrix for one query (int64)."""
        k = len(self.filters)
        docs = self.disjunctive_matches_for_text(qtext)
        if not docs.size or not k:
            return np.zeros((k, k), dtype=np.int64)
        b = np.stack(
            [
                _allowed_mask(docs, fd).astype(np.int64)
                for fd in self.filter_docs
            ]
        )
        return b @ b.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = [n for n, _ in self.filters]
        qids, keys, counts = [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for key, c in bucket_rows(names, self.buckets_for_text(qtext)):
                qids.append(qid)
                keys.append(key)
                counts.append(c)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "key": pa.array(keys, type=pa.string()),
                "n_docs": pa.array(counts, type=pa.int64()),
            }
        )


def adjacency_search(
    index_dir: str,
    queries_ds,
    filters: list[tuple[str, str]],
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, key, n_docs): per query,
    exact match-set counts for every named single-term filter and
    every pairwise intersection (key 'a&b', filter order).  Filter
    postings are index-local — no sidecar, no broadcast."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    validate_filters(filters)  # fail driver-side before spawning actors
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    return queries_ds.map_batches(
        AdjacencySearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, filters),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


OTHER_BUCKET_KEY = "_other_"


class FiltersAggSearcher(AdjacencySearcher):
    """ES ``filters`` aggregation with ``other_bucket: true``: per
    query, the match-set count under EVERY named single-term filter PLUS
    the ``_other_`` bucket (matched docs passing NO named filter).

    ES semantics pinned: every named bucket is emitted even at count
    0 (unlike the GROUP-BY-shaped adjacency matrix, which omits
    zeros), and ``_other_`` is always present; bucket order is filter
    order then ``_other_``.  Counts are one boolean mask + bincount
    per filter off the same fetched-once filter postings the
    adjacency searcher holds — no sidecar, fully index-local, and the
    per-shard (k+1)-vector is additive under doc-sharding exactly
    like the adjacency matrix (WIRED: ShardedIndex.filters_agg over
    RangeSearcher.filters_batch, pytest-pinned sharded == single)."""

    def filters_counts_for_text(self, qtext: str) -> np.ndarray:
        docs = self.disjunctive_matches_for_text(qtext)
        k = len(self.filters)
        counts = np.zeros(k + 1, dtype=np.int64)
        if docs.size:
            any_mask = np.zeros(docs.size, dtype=bool)
            for i, fd in enumerate(self.filter_docs):
                m = _allowed_mask(docs, fd)
                counts[i] = int(m.sum())
                any_mask |= m
            counts[k] = int(docs.size - any_mask.sum())
        return counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = [n for n, _ in self.filters] + [OTHER_BUCKET_KEY]
        qids, keys, counts = [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = self.filters_counts_for_text(qtext)
            for name, ci in zip(names, c):
                qids.append(qid)
                keys.append(name)
                counts.append(int(ci))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "key": pa.array(keys, type=pa.string()),
                "n_docs": pa.array(counts, type=pa.int64()),
            }
        )


def filters_agg_search(
    index_dir: str,
    queries_ds,
    filters: list[tuple[str, str]],
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, key, n_docs): the ES
    filters aggregation — every named bucket (zeros included) plus
    the ``_other_`` matched-by-no-filter bucket, per query."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    validate_filters(filters)
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    return queries_ds.map_batches(
        FiltersAggSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, filters),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
