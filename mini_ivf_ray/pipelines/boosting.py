"""Boosting query: the Elasticsearch ``boosting`` query / Lucene
BoostingQuery — rank by a positive query, DEMOTE (never filter) any
match that also matches a negative query.

    score(d) = bm25(positive, d) * (negative_boost  if d matches the
                                    negative query else 1.0)

The canonical "this, but not about that" ranking: the match set is
EXACTLY the positive query's disjunctive match set (ES: the negative
query "decreases the relevance score" — it cannot exclude a document
or admit a new one), and ``negative_boost`` in [0, 1] scales the
demoted matches' scores.  Two pinned degenerate cases make the
semantics testable: an OOV/disjoint negative leaves every score
bit-identical to plain BM25, and negative == positive demotes every
match uniformly, preserving the plain ranking ORDER while scaling
every score by exactly ``negative_boost``.

Scale shape: unlike decay.py's (doc_id, value) sidecar there is NO
broadcast at all — the negative match set is the union of the
negative terms' postings doc ids, fetched per query from the same
partition-selective reader the positive terms use, so the work is
postings-proportional and fully index-local (doc-sharded serving
needs nothing new: each shard demotes its own slice).  A
multiplicative factor <= 1 is rank-UNSAFE for text-only MaxScore/WAND
bounds, so evaluation runs the FULL exact TAAT accumulation — the
blend.py / decay.py rule.

Float determinism: the positive accumulation is the canonical
term-ordered one-`+=`-per-term pattern the SQL oracles replay, and
the demotion is one multiply by the same float64 constant on both
sides — scores hash-match under the driver's rounding.

Reference analog: query-time re-weighting over the shared posting
layout (index_ivfpq.cpp:111-117 gather loop); the negative-term
fetch reuses LoadFromBook's partition-selective reads
(index_ivfpq.cpp:330-342).
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


class BoostingSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, positive, negative, negative_boost)
    -> top-k by bm25(positive) demoted on the negative match set."""

    def _scored_blocks(self, terms: list[str]):
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
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
        return blocks

    def boosting_topk_for_text(
        self, positive: str, negative: str, negative_boost: float
    ) -> list[tuple[int, float]]:
        nb = float(negative_boost)
        if not (0.0 <= nb <= 1.0):
            raise ValueError(
                f"negative_boost must be in [0, 1], got {negative_boost}"
            )
        pos_terms = sorted(set(tokenize(positive)))
        neg_terms = sorted(set(tokenize(negative)))
        blocks = self._scored_blocks(pos_terms)
        if not blocks:
            return []
        docs, scores, scored = _taat_accumulate(blocks)
        if self.denied is not None and self.denied.size:
            keep = ~_allowed_mask(docs, self.denied)
            docs, scores = docs[keep], scores[keep]
        if not docs.size:
            return []
        neg_blocks = self._scored_blocks(neg_terms)
        if neg_blocks:
            neg_docs = np.unique(
                np.concatenate([b.all_postings()[0] for b in neg_blocks])
            )
            demoted = _allowed_mask(docs, neg_docs)
            scores = np.where(demoted, scores * np.float64(nb), scores)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return _topk_exact(docs, scores, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, pos, neg, nb in zip(
            batch["query_id"].to_pylist(),
            batch["positive"].to_pylist(),
            batch["negative"].to_pylist(),
            batch["negative_boost"].to_pylist(),
        ):
            for r, (d, s) in enumerate(
                self.boosting_topk_for_text(pos, neg, nb)
            ):
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


def boosting_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, positive, negative, negative_boost) ->
    (query_id, rank, doc_id, score) with score = bm25(positive)
    demoted by negative_boost on the negative match set.  No sidecar,
    no broadcast — both match sets come from the index's own postings
    via the partition-selective reader."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
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
        BoostingSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
