"""Field collapsing: top-k with at most one result per group.

The search-UI dedup layer (Elasticsearch ``collapse``, Google's
one-result-per-site): rank the full BM25 match set, keep only each
group's best document (score desc, doc asc), then return the top-k of
the group winners.  Exact — collapsing happens over the COMPLETE
accumulated score vector, not a truncated candidate list, so a group
whose best doc ranks 10,001st globally still surfaces if fewer than k
groups beat it.

Scale shape: identical to facets.py — the (doc_id, group-code) sidecar
is sorted by doc id and broadcast ONCE (``ray.put``, zero-copy numpy to
every actor); in doc-sharded serving each shard collapses its own
doc range locally and the merge re-collapses (group, best) pairs —
(queries x groups) rows, never doc-proportional.  Per-query work is
one TAAT accumulation plus vectorized searchsorted + lexsort.

Documents absent from the sidecar are dropped from collapsed results
(the sidecar is derived from the same corpus, so this arises only if
the caller passes a partial sidecar — documented, not silent: the
count is exposed in ``counters["collapse_missing"]``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _taat_accumulate


class CollapseSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> per query the top-k group
    winners (query_id, rank, doc_id, group, score)."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        group_ref=None,
        group_labels: list[str] | None = None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, codes = (
            ray.get(group_ref)
            if isinstance(group_ref, ray.ObjectRef)
            else group_ref
        )
        self.group_ids = np.asarray(ids, dtype=np.uint64)
        self.group_codes = np.asarray(codes, dtype=np.int64)
        self.group_labels = list(group_labels or [])
        if not np.all(self.group_ids[:-1] < self.group_ids[1:]):
            raise ValueError("group sidecar must be sorted by unique doc_id")

    def _matches_with_codes(self, qtext: str):
        """Full live match set mapped through the sidecar: (docs,
        scores, codes) or (None, None, None) when nothing matches.
        Tombstoned docs never surface from ranked retrieval, so they
        must not win (or occupy) a collapse group either."""
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        blocks = []
        for t in sorted(wanted):
            b = fetched.get(t)
            if b is None or not b.n_blocks:
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[t], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            blocks.append(b)
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not blocks:
            return None, None, None
        uniq, acc, _ = _taat_accumulate(blocks)
        self.counters["searched_cnt"] = self.counters.get(
            "searched_cnt", 0
        ) + sum(b.n_postings for b in blocks)
        if self.denied is not None and self.denied.size:
            from mini_ivf_ray.pipelines.query import _allowed_mask

            live = ~_allowed_mask(uniq, self.denied)
            uniq, acc = uniq[live], acc[live]
        if not uniq.size:
            return None, None, None
        # map docs -> group codes via the broadcast sidecar
        idx = np.searchsorted(self.group_ids, uniq)
        np.minimum(idx, max(0, self.group_ids.size - 1), out=idx)
        valid = (
            self.group_ids[idx] == uniq
            if self.group_ids.size
            else np.zeros(uniq.size, dtype=bool)
        )
        self.counters["collapse_missing"] = self.counters.get(
            "collapse_missing", 0
        ) + int((~valid).sum())
        docs, scores = uniq[valid], acc[valid]
        codes = self.group_codes[idx[valid]]
        if not docs.size:
            return None, None, None
        return docs, scores, codes

    def collapsed_topk_for_text(
        self, qtext: str
    ) -> list[tuple[int, str, float]]:
        docs, scores, codes = self._matches_with_codes(qtext)
        if docs is None:
            return []
        # winner per group under (score desc, doc asc): lexsort is
        # last-key-primary, so sort by (code, -score, doc) and take the
        # first row of each code run
        order = np.lexsort((docs, -scores, codes))
        codes_s = codes[order]
        first = np.ones(codes_s.size, dtype=bool)
        first[1:] = codes_s[1:] != codes_s[:-1]
        w = order[first]
        # global top-k over group winners, same tie rule
        worder = np.lexsort((docs[w], -scores[w]))[: self.cfg.topk]
        w = w[worder]
        return [
            (int(docs[i]), self.group_labels[int(codes[i])], float(scores[i]))
            for i in w
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, groups, scores = [], [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, g, s) in enumerate(self.collapsed_topk_for_text(qtext)):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                groups.append(g)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "grp": pa.array(groups, type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


class TopHitsSearcher(CollapseSearcher):
    """Actor-pool stage: (query_id, text) -> Elasticsearch-style
    ``terms`` aggregation with ``top_hits``: the ``max_groups`` groups
    with the most matching documents (count desc, label asc), and for
    each group its ``n_per_group`` best documents (score desc, doc
    asc).  Exact over the FULL accumulated match set, same sidecar and
    tombstone machinery as field collapsing."""

    def __init__(self, *args, n_per_group: int = 5, max_groups: int = 3, **kw):
        super().__init__(*args, **kw)
        self.n_per_group = int(n_per_group)
        self.max_groups = int(max_groups)
        # label sort key for the (count desc, label asc) group tie rule
        self._label_arr = np.asarray(self.group_labels, dtype=object)

    def top_hits_for_text(self, qtext: str):
        docs, scores, codes = self._matches_with_codes(qtext)
        if docs is None or not docs.size:
            return []
        # group match counts over the full match set
        counts = np.bincount(codes, minlength=len(self.group_labels))
        present = np.nonzero(counts)[0]
        # top max_groups by (count desc, label asc)
        sel_order = np.lexsort(
            (self._label_arr[present], -counts[present])
        )[: self.max_groups]
        selected = present[sel_order]
        # top n_per_group hits per code under (score desc, doc asc)
        order = np.lexsort((docs, -scores, codes))
        codes_s = codes[order]
        first = np.ones(codes_s.size, dtype=bool)
        first[1:] = codes_s[1:] != codes_s[:-1]
        run_start = np.cumsum(first) - 1  # run index per sorted row
        starts = np.nonzero(first)[0]
        rank_in_group = np.arange(codes_s.size) - starts[run_start]
        out = []
        for code in selected:
            in_g = order[(codes_s == code) & (rank_in_group < self.n_per_group)]
            label = self.group_labels[int(code)]
            cnt = int(counts[code])
            for hr, i in enumerate(in_g):
                out.append((label, cnt, hr, int(docs[i]), float(scores[i])))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, grps, cnts, hranks, docs, scores = [], [], [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for g, c, hr, d, s in self.top_hits_for_text(qtext):
                qids.append(qid)
                grps.append(g)
                cnts.append(c)
                hranks.append(hr)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "grp": pa.array(grps, type=pa.string()),
                "grp_count": pa.array(cnts, type=pa.int64()),
                "hit_rank": pa.array(hranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def collapsed_search(
    index_dir: str,
    queries_ds,
    group_ids,
    group_values,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, grp,
    score): top-k BM25 results collapsed to each group's single best
    document.  ``group_ids`` / ``group_values`` are the doc-id ->
    attribute sidecar (e.g. documents.doc_id / documents.lang).
    ``respect_deletes`` (default) excludes persisted tombstones, same
    as query.search."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(group_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(np.asarray(group_values, dtype=object)[order], type=pa.string())
    if vals.null_count:
        # a null group dictionary-encodes to a null index whose .astype
        # would produce a garbage code — refuse loudly; callers decide
        # the null policy (drop or substitute a sentinel) upstream
        raise ValueError(
            f"group_values contains {vals.null_count} null(s); "
            "map nulls to a sentinel label before collapsing"
        )
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

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
    group_ref = ray.put((ids, codes))
    return queries_ds.map_batches(
        CollapseSearcher,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, group_ref, labels, denied_ref,
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def grouped_top_hits(
    index_dir: str,
    queries_ds,
    group_ids,
    group_values,
    cfg: PipelineConfig | None = None,
    n_per_group: int = 5,
    max_groups: int = 3,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """Elasticsearch ``terms`` aggregation with ``top_hits``: for each
    query, the ``max_groups`` attribute values with the most matching
    documents (count desc, label asc) and each group's ``n_per_group``
    best hits (score desc, doc asc).  Exact over the FULL match set —
    a group that never cracks the global top-k still surfaces with its
    true count.  Returns (query_id, grp, grp_count, hit_rank, doc_id,
    score).  Same sidecar/broadcast/tombstone shape as
    ``collapsed_search``."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(group_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(np.asarray(group_values, dtype=object)[order], type=pa.string())
    if vals.null_count:
        raise ValueError(
            f"group_values contains {vals.null_count} null(s); "
            "map nulls to a sentinel label before aggregating"
        )
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

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
    group_ref = ray.put((ids, codes))
    return queries_ds.map_batches(
        TopHitsSearcher,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, group_ref, labels, denied_ref,
        ),
        fn_constructor_kwargs={
            "n_per_group": n_per_group, "max_groups": max_groups,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def collapsed_search_sharded(
    index_dir: str,
    queries: list[tuple[int, str]],
    group_ids,
    group_values,
    cfg: PipelineConfig | None = None,
    num_shards: int = 4,
):
    """Doc-sharded field collapsing: the scale path promised in the
    module docstring, now real.  The sidecar is partitioned on the
    index's doc-sharding ranges; each shard collapses its own range to
    per-group winners and the merge re-collapses (query x group) rows —
    never doc-proportional.  Identical to ``collapsed_search``
    (pytest-pinned)."""
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    sharded = ShardedIndex(index_dir, cfg, num_shards=num_shards)
    try:
        sharded.attach_sidecar(group_ids, group_values)
        return sharded.collapsed_search(queries)
    finally:
        sharded.shutdown()


def grouped_top_hits_sharded(
    index_dir: str,
    queries: list[tuple[int, str]],
    group_ids,
    group_values,
    cfg: PipelineConfig | None = None,
    n_per_group: int = 5,
    max_groups: int = 3,
    num_shards: int = 4,
):
    """Doc-sharded grouped top-hits: per-shard additive group counts +
    per-shard per-group top-n hits, merged driver-side under the same
    (count desc, label asc) / (score desc, doc asc) rules — identical
    to ``grouped_top_hits`` (pytest-pinned) with per-node sidecar
    memory corpus/R instead of the O(corpus) broadcast."""
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    sharded = ShardedIndex(index_dir, cfg, num_shards=num_shards)
    try:
        sharded.attach_sidecar(group_ids, group_values)
        return sharded.grouped_top_hits(
            queries, n_per_group=n_per_group, max_groups=max_groups
        )
    finally:
        sharded.shutdown()
