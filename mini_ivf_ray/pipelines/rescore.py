"""Query rescoring: the Elasticsearch rescore API / Lucene
``QueryRescorer`` two-pass serving composition.

A cheap first-pass retrieval ranks the corpus; only the top ``window``
candidates per query are re-scored by a more expensive second
similarity, and the two are blended:

    first pass:  full exact BM25 accumulation -> window = top-W by
                 (bm25 desc, doc_id asc)
    second pass: LM-Dirichlet query likelihood (Zhai & Lafferty; the
                 lm_dirichlet.py clipped Lucene form, mu=2000) over
                 the WINDOW docs only
    combined(d) = query_weight * bm25(d) + rescore_weight * dirichlet(d)
    final:       top-k of the window by (combined desc, doc_id asc)

ES semantics: documents outside the window keep their first-pass
ordering strictly BELOW every window document, so for k <= window the
final top-k is exactly the rescored window's top-k — the implemented
(and SQL-replayed) form; ``window < topk`` raises rather than silently
mixing score scales.

Exactness: both similarities are computed from ONE raw-postings fetch
per term (payload-mode readers, like synonyms/lm_dirichlet — baked
contributions cannot be inverted).  Each accumulation is the canonical
term-ordered float64 ``np.add.at`` (functions/bm25.py contract); the
blend is two multiplies and one add in float64, the identical IEEE
sequence the SQL oracle runs, and the driver's 4-dp rounding absorbs
sum-order last-ulp differences exactly as it does for bm25_topk.

Scale shape: identical to every other searcher — an actor-pool
``map_batches`` stage, index state resolved once per actor; the second
pass costs O(window) per query regardless of corpus size, which is the
entire point of the rescore pattern at 100 TB (the expensive model
never sees more than ``window`` candidates).

Reference analog: mini-ivf's refine pattern (IVFPQ coarse scan ->
exact re-rank of the shortlist, index_ivfpq.cpp refine path) is the
same two-pass shape on the vector side; ann_sq8_refined pins that one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact
from mini_ivf_ray.pipelines.synonyms import _raw_postings


class RescoreSearcher(BM25Searcher):
    """Actor-pool two-pass rescoring: (query_id, text) -> top-k by
    query_weight * bm25 + rescore_weight * dirichlet over the BM25
    top-``window`` candidates."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        window: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 0.5,
        mu: float = 2000.0,
    ):
        super().__init__(index_dir, cfg, shared_tables, decoded_refs)
        if window < self.cfg.topk:
            raise ValueError(
                f"rescore window ({window}) must be >= topk "
                f"({self.cfg.topk}): results past the window keep "
                "first-pass scores on a different scale"
            )
        if mu <= 0:
            raise ValueError(f"mu must be > 0, got {mu}")
        self.window = int(window)
        self.qw = np.float64(query_weight)
        self.rw = np.float64(rescore_weight)
        self.mu = float(mu)

    def rescore_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
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
        total = float(self.stats.total_tokens)
        n_docs = self.stats.n_docs
        avgdl = self.stats.avgdl
        per_docs: list[np.ndarray] = []
        per_b: list[np.ndarray] = []
        per_d: list[np.ndarray] = []
        scored = 0
        for t in sorted(wanted):
            blk = fetched.get(t)
            if blk is None:
                continue
            docs, tfs, dls = _raw_postings(blk)
            if not docs.size:
                continue
            scored += docs.size
            per_docs.append(docs)
            per_b.append(
                bm25.contributions(
                    tfs, dls, self.stats.df[t], n_docs, avgdl,
                    self.cfg.k1, self.cfg.b,
                )
            )
            # exact collection frequency from the scoring fetch itself
            cf = float(tfs.astype(np.float64).sum())
            c = np.log1p(
                tfs.astype(np.float64) / (self.mu * cf / total)
            ) + np.log(self.mu / (dls.astype(np.float64) + self.mu))
            np.maximum(c, 0.0, out=c)
            per_d.append(c)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not per_docs:
            return []
        cat = np.concatenate(per_docs)
        uniq, inv = np.unique(cat, return_inverse=True)
        bacc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(bacc, inv, np.concatenate(per_b))
        dacc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(dacc, inv, np.concatenate(per_d))
        # first-pass window: (bm25 desc, doc asc)
        win = np.lexsort((uniq, -bacc))[: self.window]
        combined = self.qw * bacc[win] + self.rw * dacc[win]
        return _topk_exact(uniq[win], combined, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.rescore_topk_for_text(text)):
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


def rescore_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 0.5,
    mu: float = 2000.0,
    share: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    with score = query_weight * bm25 + rescore_weight * dirichlet over
    the BM25 top-``window`` — same deployment as dirichlet_search."""
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    # driver-side copies of the actor-__init__ guards: fail fast with a
    # plain ValueError instead of an ActorDiedError at first batch
    if window < cfg.topk:
        raise ValueError(
            f"rescore window ({window}) must be >= topk ({cfg.topk})"
        )
    if mu <= 0:
        raise ValueError(f"mu must be > 0, got {mu}")
    shared = share_segments(index_dir, cfg.num_partitions) if share else None
    return queries_ds.map_batches(
        RescoreSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        fn_constructor_kwargs={
            "window": window,
            "query_weight": query_weight,
            "rescore_weight": rescore_weight,
            "mu": mu,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
