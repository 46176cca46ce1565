"""Pluggable similarity: LM Dirichlet query-likelihood scoring.

Lucene ships retrieval scoring as a pluggable ``Similarity`` (BM25,
LM Dirichlet, LM Jelinek-Mercer, DFR ...); an engine claiming its
query surface needs at least one alternative model end-to-end.  This
implements Zhai & Lafferty's Dirichlet-smoothed query likelihood in
Lucene's per-term clipped form (LMDirichletSimilarity):

    score(t, d) = max(0, ln(1 + tf / (mu * p(t|C))) + ln(mu / (dl + mu)))
    score(q, d) = sum over distinct query terms t present in d

with ``p(t|C) = cf_t / total_tokens`` (collection term frequency over
collection length) and ``mu = 2000`` by default.

Exactness notes:
  * ``cf_t`` is computed from the SAME postings fetch that scoring
    uses (sum of the term's tfs — the index stores every posting of a
    term, so the sum IS the collection frequency, no sidecar needed);
  * ``total_tokens`` is the exact integer the stats pass persisted;
  * the per-doc score is a sum of <= |q| clipped float64 terms,
    accumulated in sorted-term order — SQL-replayable (DuckDB
    GREATEST + ln on the same doubles; the driver's 4-dp rounding
    absorbs last-ulp libm differences).

Serving shape: identical deployment to synonyms.py — an actor-pool
searcher over RAW payload-mode postings (tf and dl are needed, baked
BM25 contributions cannot be inverted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, accumulate_topk
from mini_ivf_ray.pipelines.synonyms import _raw_postings


class DirichletSearcher(BM25Searcher):
    """Actor-pool LM-Dirichlet retrieval: same index, different
    similarity — (query_id, text) -> clipped query-likelihood top-k."""

    def __init__(self, *args, mu: float = 2000.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.mu = float(mu)

    def _term_contribs(self, tfs, dls, cf: float, total: float):
        """Per-posting clipped Dirichlet contributions (overridden by
        other smoothing models sharing this searcher)."""
        mu = self.mu
        c = np.log1p(tfs / (mu * cf / total)) + np.log(mu / (dls + mu))
        np.maximum(c, 0.0, out=c)
        return c

    def dirichlet_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        total = float(self.stats.total_tokens)
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
            cf = float(tfs.sum())  # exact collection frequency
            per_term.append((docs, self._term_contribs(tfs, dls, cf, total)))
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
            for r, (d, s) in enumerate(self.dirichlet_topk_for_text(text)):
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


def dirichlet_search(
    index_dir: str, queries_ds, cfg=None, mu: float = 2000.0, share: bool = True
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    under LM Dirichlet similarity — same deployment as query.search()."""
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = share_segments(index_dir, cfg.num_partitions) if share else None

    return queries_ds.map_batches(
        DirichletSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        fn_constructor_kwargs={"mu": mu},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class JelinekMercerSearcher(DirichletSearcher):
    """Lucene LMJelinekMercerSimilarity: per matched term
    ``ln(1 + ((1-lambda)/lambda) * (tf/dl) / (cf/total))`` — always
    positive, no clip.  ``lam`` in (0, 1); 0.1 suits short queries."""

    def __init__(self, *args, lam: float = 0.1, **kwargs):
        kwargs.pop("mu", None)
        super().__init__(*args, **kwargs)
        self.lam = float(lam)

    def _term_contribs(self, tfs, dls, cf: float, total: float):
        lam = self.lam
        return np.log1p(((1.0 - lam) / lam) * (tfs / dls) / (cf / total))


def jelinek_mercer_search(
    index_dir: str, queries_ds, cfg=None, lam: float = 0.1, share: bool = True
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    under Jelinek-Mercer smoothing — same deployment as
    dirichlet_search."""
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = share_segments(index_dir, cfg.num_partitions) if share else None

    return queries_ds.map_batches(
        JelinekMercerSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        fn_constructor_kwargs={"lam": lam},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
