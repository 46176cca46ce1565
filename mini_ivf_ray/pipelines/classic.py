"""Pluggable similarity: Lucene ClassicSimilarity (the pre-6.0 default
TF-IDF vector-space model), completing the similarity family next to
BM25 (functions/bm25.py), LM Dirichlet and LM Jelinek-Mercer
(lm_dirichlet.py).

Lucene's practical scoring function (TFIDFSimilarity), per query q and
document d over DISTINCT query terms:

    idf(t)      = 1 + ln(N / (df_t + 1))
    queryNorm   = 1 / sqrt(sum over ALL q terms of idf(t)^2)
                  (OOV terms contribute with df = 0 — they are still
                  clauses of the query)
    coord(q, d) = overlap / maxOverlap
                  (matched distinct terms / distinct terms in q,
                  OOV terms counted in maxOverlap, never in overlap)
    norm(d)     = 1 / sqrt(dl)
    score(q, d) = sum_t[ sqrt(tf) * idf(t)^2 * norm(d) ]
                  * (overlap / maxOverlap) * queryNorm

One documented divergence from Lucene: ``norm(d)`` is kept EXACT —
Lucene lossily quantizes it to one byte at index time
(SmallFloat.floatToByte315); an analog whose oracle replays the same
float64 expression has no reason to destroy information.

Serving shape: identical deployment to lm_dirichlet.py — an
actor-pool searcher over RAW payload-mode postings (sqrt(tf) cannot
be recovered from baked BM25 contributions).  Work is
postings-proportional; the only per-query extras are the O(|q|)
queryNorm and the same unique-inverse the accumulation already built
(reused for the overlap counts, the msm.py pattern).

Float determinism: per-term contributions are one vectorized
sqrt/divide over exact (tf, dl) integers; the accumulation is the
canonical sorted-term-order np.add.at; the final combine is
``scores * (overlap / maxOverlap) * queryNorm`` left-to-right — the
SQL oracle replays every expression verbatim and the driver's 4-dp
rounding absorbs last-ulp libm/sum-order differences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact
from mini_ivf_ray.pipelines.synonyms import _raw_postings


class ClassicSearcher(BM25Searcher):
    """Actor-pool Classic-TF-IDF retrieval: same index, Lucene's
    vector-space similarity — (query_id, text) -> top-k."""

    def classic_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
        if not terms:
            return []
        n = float(self.stats.n_docs)
        idf = {
            t: 1.0 + np.log(n / (float(self.stats.df.get(t, 0)) + 1.0))
            for t in terms
        }
        # queryNorm over ALL distinct terms (OOV included), term order
        query_norm = 1.0 / float(
            np.sqrt(np.sum(np.array([idf[t] * idf[t] for t in terms])))
        )
        max_overlap = float(len(terms))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        per_term: list[tuple[np.ndarray, np.ndarray]] = []
        scored = 0
        for t in sorted(wanted):
            b = fetched.get(t)
            if b is None:
                continue
            docs, tfs, dls = _raw_postings(b)
            if not docs.size:
                continue
            scored += docs.size
            per_term.append(
                (docs, np.sqrt(tfs) * (idf[t] * idf[t]) / np.sqrt(dls))
            )
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not per_term:
            return []
        docs_cat = np.concatenate([d for d, _ in per_term])
        con_cat = np.concatenate([c for _, c in per_term])
        uniq, inv = np.unique(docs_cat, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, con_cat)
        # overlap: matched DISTINCT terms per doc — postings are unique
        # per (term, doc), so counting concatenated rows counts terms
        overlap = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(overlap, inv, 1.0)
        final = scores * (overlap / max_overlap) * query_norm
        return _topk_exact(uniq, final, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.classic_topk_for_text(text)):
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


def classic_search(index_dir: str, queries_ds, cfg=None, share: bool = True):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    under Lucene ClassicSimilarity — same deployment as
    dirichlet_search (raw payload-mode postings)."""
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = share_segments(index_dir, cfg.num_partitions) if share else None

    return queries_ds.map_batches(
        ClassicSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
