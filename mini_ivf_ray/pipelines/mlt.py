"""More-like-this: related-document retrieval from seed documents.

Lucene's MoreLikeThis plan, Ray-Data-first: mine each seed document's
most INTERESTING terms (tf x idf — frequent in the doc, rare in the
corpus), then run them as an ordinary disjunctive BM25 query with the
seed itself excluded.  Everything downstream of mining reuses the
standard serving stack, so results are exact and bit-comparable with
bm25_topk for the mined term set.

Shape:
  1. ONE column-pruned ``map_batches`` pass over the documents
     dataset, filtered to the (broadcast) seed-id set, emits
     (seed, term, tf) rows — only seed docs are tokenized, nothing
     else leaves the pass;
  2. driver-side mining over that tiny frame: score = tf * idf
     (same idf as the scorer), deterministic (score desc, term asc)
     head of ``n_terms``;
  3. the standard ``search()`` actor pool with topk+1, dropping the
     seed row if it surfaced (it usually ranks #1 — the classic MLT
     self-hit) and re-ranking — exact top-k of the non-seed docs.

Determinism note: term scores are a single float64 multiply of an
integer tf with the shared idf, so equal products imply equal (tf, df)
and the term-asc tie-break is total — the SQL oracle replays the exact
ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize_batch
from mini_ivf_ray.state.stats import CorpusStats


def mine_seed_terms(
    docs_ds,
    seed_ids: list[int],
    stats: CorpusStats,
    n_terms: int = 5,
    exclude: set[str] | None = None,
) -> dict[int, list[str]]:
    """{seed -> top n_terms by (tf * idf desc, term asc)}, terms
    restricted to the index vocabulary (df > 0).  ``exclude`` drops
    terms BEFORE the head is taken (ES more_like_this ``unlike``:
    the head refills with the next-best terms, it does not shrink)."""
    import ray

    seeds_ref = ray.put(np.unique(np.asarray(seed_ids, dtype=np.uint64)))

    def seed_tfs(batch: pa.Table) -> pa.Table:
        import ray as _ray

        seeds = _ray.get(seeds_ref)
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        m = np.isin(ids, seeds)
        out_s: list[int] = []
        out_t: list[str] = []
        out_f: list[int] = []
        if m.any():
            rows = np.flatnonzero(m)
            toks, _ = tokenize_batch(
                batch["text"].take(pa.array(rows)).to_pylist()
            )
            for i, tk in zip(rows.tolist(), toks):
                tf: dict[str, int] = {}
                for t in tk:
                    tf[t] = tf.get(t, 0) + 1
                for t, f in tf.items():
                    out_s.append(int(ids[i]))
                    out_t.append(t)
                    out_f.append(f)
        return pa.table(
            {
                "seed": pa.array(out_s, type=pa.uint64()),
                "term": pa.array(out_t, type=pa.string()),
                "tf": pa.array(out_f, type=pa.int64()),
            }
        )

    rows = docs_ds.map_batches(seed_tfs, batch_format="pyarrow").to_pandas()
    out: dict[int, list[str]] = {}
    if rows.empty:
        return out
    for seed, g in rows.groupby("seed"):
        terms = g["term"].to_numpy()
        tfs = g["tf"].to_numpy().astype(np.float64)
        dfs = np.array([stats.df.get(t, 0) for t in terms], dtype=np.int64)
        keep = dfs > 0
        if exclude:
            keep &= np.array(
                [t not in exclude for t in terms], dtype=bool
            )
        terms, tfs, dfs = terms[keep], tfs[keep], dfs[keep]
        if not terms.size:
            out[int(seed)] = []
            continue
        idfs = np.array(
            [bm25.idf(int(d), stats.n_docs) for d in dfs], dtype=np.float64
        )
        score = tfs * idfs
        order = np.argsort(terms, kind="stable")
        order = order[np.argsort(-score[order], kind="stable")][:n_terms]
        out[int(seed)] = [str(t) for t in terms[order]]
    return out


def more_like_this(
    index_dir: str,
    docs_ds,
    seed_ids: list[int],
    cfg: PipelineConfig | None = None,
    n_terms: int = 5,
    unlike_ids: list[int] | None = None,
) -> pd.DataFrame:
    """(seed_id, rank, doc_id, score) — top cfg.topk related docs per
    seed (seed excluded), ranked by BM25 over the mined term set.

    ``unlike_ids`` (ES more_like_this ``unlike``): the DISTINCT
    vocabulary terms of those documents are removed from every seed's
    interesting-term ranking BEFORE the ``n_terms`` head is cut, so
    the head refills with the next-best terms — "like A, unlike B"
    steers the query away from B's vocabulary without shrinking it.
    One extra seed-mining pass over the unlike ids (same pruned-read
    shape); a seed whose every candidate term is excluded emits no
    results (pinned)."""
    import dataclasses

    import ray.data

    from mini_ivf_ray.pipelines.query import search

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    stats = CorpusStats.load(index_dir)
    exclude: set[str] | None = None
    if unlike_ids:
        unl = mine_seed_terms(
            docs_ds, unlike_ids, stats, n_terms=1 << 30
        )
        exclude = {t for ts in unl.values() for t in ts}
    mined = mine_seed_terms(
        docs_ds, seed_ids, stats, n_terms=n_terms, exclude=exclude
    )
    # seeds are uint64 doc ids; the serving stack's query_id is int64 —
    # run under small surrogate ids and map back afterwards
    seeds_with_terms = [s for s, t in sorted(mined.items()) if t]
    items = [
        {"query_id": i, "text": " ".join(mined[s])}
        for i, s in enumerate(seeds_with_terms)
    ]
    if not items:
        return pd.DataFrame(columns=["seed_id", "rank", "doc_id", "score"])
    wide = dataclasses.replace(cfg, topk=cfg.topk + 1)
    res = search(index_dir, ray.data.from_items(items), wide).to_pandas()
    rows = []
    for qid, g in res.groupby("query_id"):
        seed = seeds_with_terms[int(qid)]
        g = g.sort_values("rank")
        kept = [
            (int(d), float(s))
            for d, s in zip(g["doc_id"], g["score"])
            if int(d) != int(seed)
        ][: cfg.topk]
        rows.extend(
            (int(seed), r, d, s) for r, (d, s) in enumerate(kept)
        )
    out = pd.DataFrame(rows, columns=["seed_id", "rank", "doc_id", "score"])
    if len(out):
        out["doc_id"] = out["doc_id"].astype(np.uint64)
    return out
