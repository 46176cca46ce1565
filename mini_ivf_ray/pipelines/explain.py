"""Score explanation: the Lucene/ES Explain API analog — the full
per-term BM25 breakdown for every top-k hit of a query.

``explain()`` in Lucene returns, for a (query, doc) pair, the tree of
score components: per-term idf, tf normalization, and the summed
total.  Here the same breakdown is a FLAT result table — one row per
(query, ranked hit, matched term):

    (query_id, rank, doc_id, term, tf, df, idf_r, contrib_r, score_r)

where ``contrib = idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` is the
term's exact float64 contribution (functions/bm25.py contract) and
``score`` is the doc's total — so per query the rows of one doc sum
(term-ordered) to its score, the debugging invariant the Explain API
exists to expose.  A top-k doc missing a query term simply has no row
for it (Lucene prints a 0-weight node; a flat table drops it).

Served INDEX-ONLY from payload-mode readers (raw tf/dl needed — the
synonyms/LM family): ranking is the canonical term-ordered float64
``np.add.at`` accumulation, bit-identical to query.search, and the
breakdown rows are a searchsorted gather of each term's postings at
the top-k docs — O(k x terms) extra work per query, independent of
corpus size.  The SQL oracle replays the identical per-(query, doc,
term) contribution CTE under the summed-score top-10 window.

Exactness note: ranking uses the SAME accumulation as plain BM25, so
the explained top-k IS query.search's top-k (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact
from mini_ivf_ray.pipelines.synonyms import _raw_postings


class ExplainSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> per-term breakdown rows
    for the query's exact BM25 top-k."""

    def explain_for_text(
        self, qtext: str
    ) -> list[tuple[int, int, str, float, float, float, float, float]]:
        """[(rank, doc_id, term, tf, df, idf, contrib, total)] for the
        top-k docs of ``qtext``."""
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
        per: list[tuple[str, np.ndarray, np.ndarray, float, float]] = []
        scored = 0
        for t in sorted(wanted):
            blk = fetched.get(t)
            if blk is None:
                continue
            docs, tfs, dls = _raw_postings(blk)
            if not docs.size:
                continue
            scored += docs.size
            df_t = float(self.stats.df[t])
            contrib = bm25.contributions(
                tfs, dls, df_t, n_docs, avgdl, self.cfg.k1, self.cfg.b
            )
            per.append((t, docs, contrib, tfs, df_t))
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not per:
            return []
        cat = np.concatenate([d for _, d, _, _, _ in per])
        uniq, inv = np.unique(cat, return_inverse=True)
        totals = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(totals, inv, np.concatenate([c for _, _, c, _, _ in per]))
        top = _topk_exact(uniq, totals, self.cfg.topk)
        if not top:
            return []
        top_docs = np.array([d for d, _ in top], dtype=np.uint64)
        rows = []
        for t, docs, contrib, tfs, df_t in per:
            idf_t = bm25.idf(df_t, n_docs)
            # gather this term's postings at the top-k docs
            idx = np.searchsorted(docs, top_docs)
            np.minimum(idx, docs.size - 1, out=idx)
            hit = docs[idx] == top_docs
            for r, h in enumerate(hit):
                if h:
                    rows.append(
                        (
                            r,
                            int(top_docs[r]),
                            t,
                            float(tfs[idx[r]]),
                            df_t,
                            idf_t,
                            float(contrib[idx[r]]),
                            float(top[r][1]),
                        )
                    )
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, terms, tfs, dfs, idfs, contribs, totals = (
            [], [], [], [], [], [], [], [], []
        )
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, d, t, tf, df, i, c, s in self.explain_for_text(qtext):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                terms.append(t)
                tfs.append(tf)
                dfs.append(df)
                idfs.append(i)
                contribs.append(c)
                totals.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "term": pa.array(terms, type=pa.string()),
                "tf": pa.array(tfs, type=pa.float64()),
                "df": pa.array(dfs, type=pa.float64()),
                "idf": pa.array(idfs, type=pa.float64()),
                "contrib": pa.array(contribs, type=pa.float64()),
                "score": pa.array(totals, type=pa.float64()),
            }
        )


def explain_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    share: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, term, tf,
    df, idf, contrib, score): the per-term BM25 breakdown of each
    query's exact top-k, served index-only over payload-mode readers
    (raw tf/dl needed; same deployment as synonym_search)."""
    from mini_ivf_ray.pipelines.query import share_segments

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = share_segments(index_dir, cfg.num_partitions) if share else None
    return queries_ds.map_batches(
        ExplainSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
