"""Minimum-should-match retrieval (Lucene/Elasticsearch
``minimum_should_match``): rank documents matching at least ``m`` of
the query's distinct terms by their BM25 score over the terms they DO
match.

The middle ground between disjunctive (m=1, query.py mode="or") and
conjunctive (m=k, mode="and") retrieval — the web-search default for
multi-term queries ("match most of the words").  Evaluation is the
same single TAAT union pass as every other query path; the per-doc
distinct-term match count falls out of the same ``np.unique`` inverse
that drives the score accumulation, so the msm filter costs one
integer bincount, no extra postings decode.

Semantics pinned (Lucene's): ``m`` counts DISTINCT matched query
terms; a query with fewer than ``m`` indexed terms matches nothing
(msm is never clamped down); tombstoned docs are masked before
ranking; ties break (score desc, doc asc) like every other surface.

Serving shape: MsmSearcher subclasses the BM25Searcher actor — same
once-per-actor index state, same zero-copy shared decode, only the
per-query evaluation differs (the boolquery.py pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact


def _accumulate_with_counts(
    blocks_list,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(unique docs asc, scores, distinct-term match counts, postings
    decoded): the _taat_accumulate pattern plus an integer match-count
    accumulated off the same unique-inverse."""
    blocks_list = sorted(
        (b for b in blocks_list if b.n_blocks), key=lambda b: b.term
    )
    if not blocks_list:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.float64),
            np.empty(0, dtype=np.int64),
            0,
        )
    parts = [b.all_postings() for b in blocks_list]
    scored = sum(d.size for d, _ in parts)
    uniq, inv = np.unique(
        np.concatenate([d for d, _ in parts]), return_inverse=True
    )
    scores = np.zeros(len(uniq), dtype=np.float64)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    off = 0
    for d, c in parts:
        scores[inv[off : off + d.size]] += c
        off += d.size
    return uniq, scores, counts, scored


class MsmSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text, min_match) -> top-k
    (query_id, rank, doc_id, n_matched, score)."""

    def msm_topk_for_text(self, qtext: str, min_match: int):
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        # fewer indexed terms than m can never satisfy msm — skip the
        # fetch entirely (Lucene: msm above the clause count = no hit)
        if len(wanted) < min_match:
            return []
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
        uniq, acc, counts, scored = _accumulate_with_counts(blocks)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        if not uniq.size:
            return []
        keep = counts >= min_match
        uniq, acc, counts = uniq[keep], acc[keep], counts[keep]
        if self.denied is not None and self.denied.size and uniq.size:
            from mini_ivf_ray.pipelines.query import _allowed_mask

            live = ~_allowed_mask(uniq, self.denied)
            uniq, acc, counts = uniq[live], acc[live], counts[live]
        if not uniq.size:
            return []
        hits = _topk_exact(uniq, acc, self.cfg.topk)
        cnt_by_doc = dict(zip(uniq.tolist(), counts.tolist()))
        return [(d, int(cnt_by_doc[d]), s) for d, s in hits]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, nm, scores = [], [], [], [], []
        mm = batch["min_match"].to_pylist()
        for qid, qtext, m in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist(), mm
        ):
            for r, (d, c, s) in enumerate(
                self.msm_topk_for_text(qtext, int(m))
            ):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                nm.append(c)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "n_matched": pa.array(nm, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def msm_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text, min_match) -> top-k (query_id, rank,
    doc_id, n_matched, score) under minimum-should-match semantics."""
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
        MsmSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
