"""Disjunction-max retrieval: Lucene's ``DisjunctionMaxQuery``.

The multi-field / synonym-expansion scoring rule search engines use
when query terms are ALTERNATIVES rather than requirements: instead of
summing per-term BM25 contributions (which double-counts a document
that happens to contain two near-synonyms), the document's score is
its BEST single-term score plus a small ``tie_breaker`` fraction of
the rest::

    score(d) = max_t s_t(d) + tie * (sum_t s_t(d) - max_t s_t(d))

``tie = 0`` is a pure max (Lucene's default), ``tie = 1`` degrades to
the plain disjunctive sum; anything between rewards multi-term matches
without letting them swamp the best single match.

Serving shape: identical deployment to query.search() — actor pool
over the baked shared-decode views; the only change is the
accumulation kernel, which tracks a per-doc running MAX alongside the
running SUM (one ``np.maximum.at`` next to the ``np.add.at``; BM25
contributions are strictly positive so a zero-initialised max is
exact).  The combine is two IEEE float64 multiplies/adds, identical in
the SQL oracle, so results hash-match bit-for-bit after the house
4-decimal rounding.

The max/sum of per-term scores cannot be pruned by the text-only
sum bounds MaxScore/WAND carry, so evaluation is the FULL exact TAAT
accumulation — the same rank-safety rule the static-score blend
follows (reference analog: QueryBaseline's unpruned member-at-a-time
scan, index_ivfpq.cpp:351-410).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact


def dismax_combine(
    per_term: list[tuple[np.ndarray, np.ndarray]], tie: float, topk: int
) -> list[tuple[int, float]]:
    """Per-term (sorted doc_ids, float64 contributions) pairs ->
    exact (score desc, doc asc) top-k under the dis-max rule."""
    if not per_term:
        return []
    docs_cat = np.concatenate([d for d, _ in per_term])
    con_cat = np.concatenate([c for _, c in per_term])
    uniq, inv = np.unique(docs_cat, return_inverse=True)
    sums = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(sums, inv, con_cat)
    mx = np.zeros(uniq.size, dtype=np.float64)  # contribs > 0, exact
    np.maximum.at(mx, inv, con_cat)
    return _topk_exact(uniq, mx + tie * (sums - mx), topk)


class DisMaxSearcher(BM25Searcher):
    """Actor-pool dis-max retrieval: per-term BM25 contributions
    combined as ``max + tie * (sum - max)`` instead of the plain sum."""

    def __init__(self, *args, tie_breaker: float = 0.3, **kwargs):
        if not (0.0 <= tie_breaker <= 1.0):
            # Lucene's contract: the tie breaker is a fraction
            raise ValueError(f"tie_breaker must be in [0, 1]: {tie_breaker}")
        super().__init__(*args, **kwargs)
        self.tie = float(tie_breaker)

    def dismax_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        scored = 0
        per_term: list[tuple[np.ndarray, np.ndarray]] = []
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
            d, c = b.all_postings()
            scored += d.size
            per_term.append((d, c))
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return dismax_combine(per_term, self.tie, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.dismax_topk_for_text(text)):
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


def dismax_search(
    index_dir: str,
    queries_ds,
    cfg=None,
    tie_breaker: float = 0.3,
    share: str | bool = "decoded",
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    under the dis-max rule — the same deployment shape as
    query.search()."""
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import share_segments
    from mini_ivf_ray.sources.decoded import share_decoded_index

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = decoded = None
    if share == "decoded":
        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        shared = share_segments(index_dir, cfg.num_partitions)
    return queries_ds.map_batches(
        DisMaxSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={"tie_breaker": tie_breaker},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
