"""Static-score blending: BM25 text relevance + link-authority prior.

The canonical web-ranking composition (Brin & Page 1998: textual match
quality combined with a query-independent PageRank prior):

    blended(q, d) = bm25(q, d) + w * (static_rank(d) / scale)

ranked (blended desc, doc_id asc).  ``static_rank`` is any int64
per-document prior — here the fixed-point PageRank of
``graph.pagerank`` (scale = graph.PR_SCALE), but recency, spam, or
quality scores fit the same slot.

Scale shape: the (doc_id, static) sidecar is the same column-slim
O(corpus) shape as facets/collapse — broadcast once here; in
doc-sharded serving each shard holds its corpus/R slice exactly like
``ShardedIndex.attach_sidecar``.  The prior changes RANKING, so
top-k-bound pruning (MaxScore/WAND) over text-only bounds is
rank-unsafe: queries evaluate through the FULL TAAT accumulation, the
same exactness rule as search_after cursors.  The index-local scale
path is bound augmentation — bake max(static) per posting block into
the stored block maxima at encode time so pruning stays rank-safe;
documented, not yet wired (the exact path is the correctness
baseline it would be pinned against).

Float determinism: blended = score + w * (static / scale) is one
division, one multiply, one add in float64 — the identical IEEE
sequence the SQL oracle runs, so scores hash-match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _allowed_mask,
    _taat_accumulate,
    _topk_exact,
)


class BlendedSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> top-k by
    bm25 + w * static/scale.  Sidecar resolved once per actor."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        static_ref=None,
        w: float = 0.5,
        scale: int = 10**12,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, ranks = (
            ray.get(static_ref)
            if isinstance(static_ref, ray.ObjectRef)
            else static_ref
        )
        self.static_ids = np.asarray(ids, dtype=np.uint64)
        self.static_ranks = np.asarray(ranks, dtype=np.int64)
        if not np.all(self.static_ids[:-1] < self.static_ids[1:]):
            raise ValueError("static sidecar must be sorted by unique doc_id")
        self.w = np.float64(w)
        self.scale = np.float64(scale)

    def blended_topk_for_text(self, qtext: str):
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        # per-partition probe bookkeeping, same as the base
        # topk_for_text — blended queries must stay visible to the
        # QueryObs counters every other search path feeds
        pp = self.counters.setdefault("partition_probes", {})
        for t, locs in wanted.items():
            for p in dict.fromkeys(locs):
                pp[p] = pp.get(p, 0) + 1
        blocks = []
        for t in sorted(wanted):
            b = fetched.get(t)
            if b is None or not b.n_blocks:
                continue
            from mini_ivf_ray.functions import bm25

            b.set_scoring(
                bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            blocks.append(b)
        if not blocks:
            return []
        docs, scores, scored = _taat_accumulate(blocks)
        if self.denied is not None and self.denied.size:
            keep = ~_allowed_mask(docs, self.denied)
            docs, scores = docs[keep], scores[keep]
        if not docs.size:
            return []
        if self.static_ids.size:
            idx = np.searchsorted(self.static_ids, docs)
            np.minimum(idx, self.static_ids.size - 1, out=idx)
            hit = self.static_ids[idx] == docs
            static = np.where(hit, self.static_ranks[idx], 0).astype(
                np.float64
            )
        else:
            # empty sidecar: every doc blends with prior 0
            static = np.zeros(docs.size, dtype=np.float64)
        blended = scores + self.w * (static / self.scale)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return _topk_exact(docs, blended, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.blended_topk_for_text(qtext)):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def blended_search(
    index_dir: str,
    queries_ds,
    static_ids,
    static_ranks,
    cfg: PipelineConfig | None = None,
    w: float = 0.5,
    scale: int = 10**12,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    with score = bm25 + w * static/scale.  The sidecar is broadcast
    ONCE (``ray.put``); tombstones masked like query.search."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(static_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    ranks = np.asarray(static_ranks, dtype=np.int64)[order]

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
    static_ref = ray.put((ids, ranks))
    return queries_ds.map_batches(
        BlendedSearcher,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, static_ref, w, scale, denied_ref,
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
