"""Federated multi-index search with global DFS statistics — the
Elasticsearch ``dfs_query_then_fetch`` semantics applied ACROSS
separately-built indices (multi-index search, ``idx-a,idx-b/_search``
and the cross-cluster-search scoring problem).

The problem it solves: BM25 scores depend on collection statistics
(df, N, avgdl).  Two indices built independently over disjoint
document sets each carry LOCAL statistics, so naively merging their
per-index rankings compares incomparable scores (ES's default
query_then_fetch — the well-known small-shard relevance skew).  The
DFS phase fixes it: a pre-query statistics exchange combines the
indices' term statistics into GLOBAL values, every index scores its
own postings under those global statistics, and the merged ranking is
EXACTLY the ranking a single index over the union corpus would
produce — bit-identical, pytest- and oracle-pinned here, because
every per-posting contribution is a pure function of
(tf, dl, df_global, N_global, avgdl_global) and the candidate sets
are disjoint.

Cost shape: the DFS exchange ships one (term -> df, cf) row per
query term per index — queries x terms x indices slim rows, exactly
ES's AggregatedDfs.  Everything else is each index's normal local
evaluation; the merge is a (indices x k) candidate top-k.

``global_stats`` merges full index dictionaries (driver-side dict
sums — vocabulary-sized, the same budget as each index's own stats
object); ``dfs_multi_search`` needs only the query terms' rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _taat_accumulate,
    _topk_exact,
)
from mini_ivf_ray.state.stats import CorpusStats


def global_stats(stats_list: list[CorpusStats]) -> dict:
    """ES AggregatedDfs: summed df/cf/n_docs/total_tokens across
    indices.  Assumes the indices cover DISJOINT document sets (the
    multi-index contract; overlapping ids would double-count)."""
    if not stats_list:
        raise ValueError("no indices")
    n_docs = sum(s.n_docs for s in stats_list)
    total = sum(s.total_tokens for s in stats_list)
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for s in stats_list:
        for t, d in s.df.items():
            df[t] = df.get(t, 0) + d
        for t, c in s.cf.items():
            cf[t] = cf.get(t, 0) + c
    return {
        "n_docs": n_docs,
        "total_tokens": total,
        "avgdl": total / n_docs if n_docs else 0.0,
        "df": df,
        "cf": cf,
    }


def dfs_multi_search(
    index_dirs: list[str],
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    dfs: bool = True,
) -> pd.DataFrame:
    """(query_id, rank, doc_id, score) over the UNION of the indices'
    corpora.  ``dfs=True`` (ES dfs_query_then_fetch): every index
    scores under the combined global statistics — the merged ranking
    is bit-identical to a single union-corpus index.  ``dfs=False``
    (query_then_fetch): each index scores under its LOCAL statistics —
    provided for the contrast; the tests pin that it genuinely
    diverges."""
    if not index_dirs:
        raise ValueError("no indices")
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dirs[0])
    searchers = [BM25Searcher(d, cfg) for d in index_dirs]
    g = global_stats([s.stats for s in searchers])

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, qtext in queries:
        terms = sorted(set(tokenize(qtext)))
        cand_docs: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        for s in searchers:
            wanted = {
                t: s.stats.term_locations(t, cfg)
                for t in terms
                if s.stats.df.get(t, 0) > 0
            }
            fetched = s.reader.fetch_terms(wanted)
            blocks = []
            for t in sorted(wanted):
                b = fetched.get(t)
                if b is None or not b.n_blocks:
                    continue
                if dfs:
                    idf = bm25.idf(g["df"][t], g["n_docs"])
                    avgdl = g["avgdl"]
                else:
                    idf = bm25.idf(s.stats.df[t], s.stats.n_docs)
                    avgdl = s.stats.avgdl
                b.set_scoring(idf, avgdl, cfg.k1, cfg.b)
                blocks.append(b)
            if not blocks:
                continue
            d, sc, _ = _taat_accumulate(blocks)
            if d.size:
                cand_docs.append(d)
                cand_scores.append(sc)
        if not cand_docs:
            continue
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        # disjoint-corpus contract: a doc id must come from ONE index
        uniq = np.unique(docs)
        if uniq.size != docs.size:
            raise ValueError(
                "indices overlap: the same doc_id scored in two indices"
            )
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        for r, (d, sc) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(d)
            out["score"].append(sc)
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df
