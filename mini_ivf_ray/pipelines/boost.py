"""Query-time term boosting: Lucene's ``term^weight`` syntax.

The last piece of a search box's query language after boolean /
phrase / fuzzy / wildcard: a per-term multiplicative boost applied at
QUERY time (no reindex), ``"title_term^2.5 body_term"``.  A boost
scales the term's whole BM25 contribution, so the engine can serve it
from the baked shared-decode views (contributions precomputed) — the
weighted accumulation is the only change.

Semantics: duplicate query terms are merged by SUMMING their boosts
(``a^2 a`` == ``a^3``), mirroring what a weighted disjunction of the
same term means under TAAT accumulation; the SQL oracle replays the
same rule with a GROUP BY over (query, term).

Serving shape: identical deployment to query.search() — actor pool,
shared decoded index, per-term vectorized gather; accumulation is one
``np.add.at`` per query over boost-scaled per-term contributions in
sorted-term order (deterministic, SQL-replayable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, accumulate_topk


def parse_boosts(qtext: str) -> dict[str, float]:
    """``"data^2 web the^0.5"`` -> {term: summed boost}.  A part with
    no ``^`` boosts 1.0; the part before ``^`` goes through the
    indexing tokenizer (a multi-token part spreads its boost to each
    token); a malformed boost raises ValueError."""
    out: dict[str, float] = {}
    for part in qtext.split():
        if "^" in part:
            body, _, w = part.rpartition("^")
            try:
                boost = float(w)
            except ValueError:
                raise ValueError(f"malformed boost: {part!r}") from None
            if boost <= 0:
                # Lucene's contract: negative boosts are rejected; zero
                # would silently erase the term — both are caller bugs
                raise ValueError(f"boost must be positive: {part!r}")
        else:
            body, boost = part, 1.0
        toks = tokenize(body)
        if "^" in part and not toks:
            # '^2' or '!!^3': a boost with nothing to attach to must
            # not vanish silently — same error surface as 'term^oops'
            raise ValueError(f"boost with empty term: {part!r}")
        for t in toks:
            out[t] = out.get(t, 0.0) + boost
    return out


class BoostSearcher(BM25Searcher):
    """Actor-pool boosted retrieval: the ``text`` column carries
    ``term^w`` syntax; per-term BM25 contributions are scaled by the
    summed boost before accumulation."""

    def boosted_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        boosts = parse_boosts(qtext)
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in sorted(boosts)
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
            per_term.append((d, boosts[t] * c))
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return accumulate_topk(per_term, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.boosted_topk_for_text(text)):
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


def boosted_search(
    index_dir: str, queries_ds, cfg=None, share: str | bool = "decoded"
):
    """queries (query_id, text with term^w) -> (query_id, rank,
    doc_id, score) — the same deployment shape as query.search()."""
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
        BoostSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
