"""Common-terms retrieval: Lucene ``CommonTermsQuery`` / the ES
``common`` terms query (the pre-BM25-era stopword fix, Cutting &
Pedersen's frequency-cutoff idea as Lucene ships it).

Stopword REMOVAL loses recall ("to be or not to be" becomes empty);
plain disjunction over a query containing stopwords scans the longest
posting lists in the index for docs that match nothing else.  The
common-terms query splits the query's terms by document frequency at
``max_term_frequency`` (df/N > cutoff => "common"):

  * a document QUALIFIES only if it matches at least one LOW-frequency
    (rare) term — the high-frequency terms alone can never produce a
    hit;
  * every matched query term (common AND rare) still contributes its
    full BM25 score to qualifying documents — stopwords refine ranking
    without driving matching;
  * a query with NO rare term degenerates to the plain disjunction
    over its (all-common) terms, exactly Lucene's rewrite.

Scale shape: the qualifying set is the union of the RARE terms'
posting lists — short by definition of the cutoff — so at 100 TB the
candidate set stays small even though the common terms' long lists
are still gathered for scoring (Lucene pays the same gather; the
MaxScore/WAND-style fix of skip-gathering common lists against the
rare-candidate set is a documented optimization whose correctness
baseline is this exact path).

Exactness: contributions accumulate in lexicographic term order
(functions/bm25.py contract) over one raw-postings fetch per term;
the qualify mask is a set-membership test after accumulation, so
scores of surviving docs are bit-identical to plain BM25's — the SQL
oracle replays the same sum + an EXISTS-a-rare-term filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact
from mini_ivf_ray.pipelines.synonyms import _raw_postings


class CommonTermsSearcher(BM25Searcher):
    """Actor-pool common-terms retrieval: (query_id, text) -> top-k
    BM25 over docs matching >= 1 rare term (df/N <= cutoff)."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        max_term_frequency: float = 0.10,
    ):
        super().__init__(index_dir, cfg, shared_tables, decoded_refs)
        if not (0.0 < max_term_frequency < 1.0):
            raise ValueError(
                f"max_term_frequency must be in (0, 1), got "
                f"{max_term_frequency}"
            )
        self.cutoff = float(max_term_frequency)

    def common_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
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
        n_docs = self.stats.n_docs
        avgdl = self.stats.avgdl
        per_docs: list[np.ndarray] = []
        per_b: list[np.ndarray] = []
        rare_docs: list[np.ndarray] = []
        has_rare_term = False
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
            # the SAME float64 division the SQL oracle runs
            if np.float64(self.stats.df[t]) / np.float64(n_docs) <= self.cutoff:
                has_rare_term = True
                rare_docs.append(docs)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not per_docs:
            return []
        cat = np.concatenate(per_docs)
        uniq, inv = np.unique(cat, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, np.concatenate(per_b))
        if has_rare_term:
            qual = np.unique(np.concatenate(rare_docs))
            idx = np.searchsorted(qual, uniq)
            np.minimum(idx, max(qual.size - 1, 0), out=idx)
            keep = qual[idx] == uniq
            uniq, scores = uniq[keep], scores[keep]
        # no rare term: Lucene's rewrite — plain disjunction over the
        # all-common terms (every matched doc qualifies)
        if not uniq.size:
            return []
        return _topk_exact(uniq, scores, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.common_topk_for_text(text)):
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


def common_terms_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    max_term_frequency: float = 0.10,
    share: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score):
    BM25 over all matched terms, result set gated on matching >= 1
    rare (df/N <= cutoff) term — same deployment as query.search."""
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    if not (0.0 < max_term_frequency < 1.0):
        raise ValueError(
            f"max_term_frequency must be in (0, 1), got {max_term_frequency}"
        )
    shared = share_segments(index_dir, cfg.num_partitions) if share else None
    return queries_ds.map_batches(
        CommonTermsSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        fn_constructor_kwargs={"max_term_frequency": max_term_frequency},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
