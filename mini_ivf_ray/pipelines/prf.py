"""Pseudo-relevance-feedback query expansion (two-pass retrieval).

The classic Rocchio/RM3-family serving pattern: run the query, mine
expansion terms from the top-``fb_k`` documents, re-run the expanded
query.  Term selection is INTEGER-exact so the whole pipeline is
SQL-replayable bit-for-bit: an expansion candidate is ranked by
(sum of tf over feedback docs DESC, corpus df ASC, term ASC) — no
float weights whose cross-engine summation order could flip a
tie — excluding the original query terms and a fixed stopword list.

Ray-Data-first shape: both retrieval passes are the existing searcher
(actor pool / local); the only new data movement is the feedback-text
fetch — the (tiny) top-k doc-id set broadcast once, ONE column-pruned
pass over the documents table emitting (query_id, term, tf) partials
for feedback docs only (≤ queries x fb_k docs ever come back).

Reference analog: none (vector-only engine); this extends the
query-side surface like phrase search / spell / snippets do.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import term_freqs, tokenize


def expansion_terms(
    docs_ds,
    results: pd.DataFrame,
    query_texts: dict[int, str],
    df_lookup: dict[str, int],
    n_expand: int = 2,
    stopwords: frozenset = frozenset(),
) -> dict[int, list[str]]:
    """query_id -> up to ``n_expand`` expansion terms mined from that
    query's result docs in ``results`` (query_id, doc_id): rank by
    (sum tf over feedback docs desc, corpus df asc, term asc),
    excluding the query's own terms and ``stopwords``."""
    import ray

    need: dict[int, list[int]] = {}
    for qid, did in results[["query_id", "doc_id"]].itertuples(index=False):
        need.setdefault(int(did), []).append(int(qid))
    need_ref = ray.put(need)

    def emit(batch: pa.Table) -> pa.Table:
        import ray as _ray

        need_b = _ray.get(need_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_q, out_t, out_w = [], [], []
        hit = [i for i, d in enumerate(ids) if int(d) in need_b]
        if hit:
            texts = batch["text"].take(pa.array(hit)).to_pylist()
            for i, text in zip(hit, texts):
                tf = term_freqs(text)
                for qid in need_b[int(ids[i])]:
                    for t, f in tf.items():
                        out_q.append(qid)
                        out_t.append(t)
                        out_w.append(f)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "term": pa.array(out_t, type=pa.string()),
                "w": pa.array(out_w, type=pa.int64()),
            }
        )

    rows = docs_ds.map_batches(emit, batch_format="pyarrow").to_pandas()
    out: dict[int, list[str]] = {}
    if "query_id" not in rows.columns or not len(rows):
        return out
    agg = rows.groupby(["query_id", "term"], sort=False)["w"].sum().reset_index()
    for qid, g in agg.groupby("query_id"):
        own = set(tokenize(query_texts.get(int(qid), "")))
        g = g[~g["term"].isin(own) & ~g["term"].isin(stopwords)]
        g = g.assign(df=[int(df_lookup.get(t, 0)) for t in g["term"]])
        g = g.sort_values(
            ["w", "df", "term"], ascending=[False, True, True],
            kind="mergesort",
        ).head(n_expand)
        out[int(qid)] = g["term"].tolist()
    return out


def prf_search(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    cfg=None,
    n_expand: int = 2,
    fb_k: int | None = None,
    stopwords: frozenset = frozenset(),
    share: str | bool = False,
):
    """Two-pass PRF retrieval -> (results_df, expansions).  Pass 1:
    standard BM25 top-k; mine expansion terms from the feedback docs;
    pass 2: BM25 over original + expansion terms (corpus statistics
    unchanged — the expanded query is just a longer query)."""
    import ray.data

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.query import search
    from mini_ivf_ray.state.stats import CorpusStats

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    stats = CorpusStats.load(index_dir)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    first = search(index_dir, qds, cfg, share=share).to_pandas()
    first["doc_id"] = first["doc_id"].astype(np.int64)
    fb = first[first["rank"] < (fb_k if fb_k is not None else cfg.topk)]
    exp = expansion_terms(
        docs_ds, fb, dict(queries), stats.df,
        n_expand=n_expand, stopwords=stopwords,
    )
    expanded = [
        (qid, text + "".join(f" {t}" for t in exp.get(qid, [])))
        for qid, text in queries
    ]
    qds2 = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in expanded]
    )
    second = search(index_dir, qds2, cfg, share=share).to_pandas()
    return second, exp
