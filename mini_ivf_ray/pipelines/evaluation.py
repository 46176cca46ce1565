"""Search-quality evaluation: NDCG@k, MRR@k, recall@k over a run.

The relevance-eval harness every retrieval engine ships next to its
index (trec_eval's core metrics), and the text-side big sibling of the
reference's Recall@k loop (mini-ivf index_ivfpq.cpp evaluates recall
against a ground-truth table the same way).  Relevance judgments
(qrels) here are derived from the corpus itself so the whole operator
stays deterministic and SQL-replayable: a document's graded relevance
for a query is the number of DISTINCT query terms it contains
(rel > 0 = relevant), the classic term-overlap grade.

Ray-Data-first shape — the qrels side never materializes:

  * the run (queries x top-k rows — tiny) is broadcast ONCE;
  * ONE ``map_batches`` pass streams the documents, grades every doc
    against every query with vectorized ``np.isin`` + ``bincount``
    over per-doc DISTINCT terms, and emits only per-block PARTIALS:
    per query a relevant-doc count, the block's top-k relevance
    grades (enough to reconstruct the global ideal DCG, since IDCG@k
    only needs the k best grades), and the grades of run docs seen in
    the block — at most ``1 + k + hits`` slim rows per query per
    block regardless of corpus size;
  * the driver merges partials (blocks x queries x (k+1) rows) and
    computes the metrics: DCG with the standard ``(2^rel - 1) /
    log2(rank + 2)`` gain/discount, NDCG = DCG/IDCG, MRR = 1/(first
    relevant rank + 1), recall@k = relevant-retrieved / total-relevant.

Determinism: grades are integers, partial top-k merge is order-free,
and each metric is a sum of <= k fixed-order float64 terms — the SQL
oracle replays them exactly (up to the 4-dp rounding the oracle
convention applies to all float outputs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize, tokenize_batch


def _grade_partials(queries: list[tuple[int, list[str]]], run_docs, k: int):
    """Batch UDF factory: emits per-block partial rows
    (query_id, kind, doc_id, val) with kind 0=count, 1=top-grade,
    2=run-doc grade."""

    def grade(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        toks, _ = tokenize_batch(texts)
        flat_terms: list[str] = []
        didx: list[int] = []
        for i, tk in enumerate(toks):
            s = set(tk)
            flat_terms.extend(s)
            didx.extend([i] * len(s))
        terms_arr = np.array(flat_terms, dtype=object)
        didx_arr = np.array(didx, dtype=np.int64)
        out_q, out_k, out_d, out_v = [], [], [], []
        for qid, qterms in queries:
            if terms_arr.size:
                m = np.isin(terms_arr, np.array(qterms, dtype=object))
                rel = np.bincount(didx_arr[m], minlength=len(texts))
            else:
                rel = np.zeros(len(texts), dtype=np.int64)
            pos = np.flatnonzero(rel > 0)
            # partial relevant count
            out_q.append(qid); out_k.append(0); out_d.append(0)
            out_v.append(int(pos.size))
            # partial top-k grades (enough for global IDCG@k)
            top = np.sort(rel[pos])[::-1][:k]
            for g in top:
                out_q.append(qid); out_k.append(1); out_d.append(0)
                out_v.append(int(g))
            # grades of run docs present in this block
            rd = run_docs.get(qid)
            if rd is not None and pos.size:
                hit = np.isin(ids, rd)
                for i in np.flatnonzero(hit & (rel > 0)):
                    out_q.append(qid); out_k.append(2)
                    out_d.append(int(ids[i])); out_v.append(int(rel[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "kind": pa.array(out_k, type=pa.int8()),
                "doc_id": pa.array(out_d, type=pa.uint64()),
                "val": pa.array(out_v, type=pa.int64()),
            }
        )

    return grade


def eval_search_quality(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    k: int = 10,
) -> pd.DataFrame:
    """(query_id, n_rel, hits, ndcg, mrr, recall) at cutoff ``k`` for
    the engine's own BM25 run over ``queries``; qrels = term-overlap
    grades computed in one streamed documents pass."""
    import ray.data

    from mini_ivf_ray.pipelines.query import search

    import dataclasses

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    # metrics@k need a run that is at least k deep — a cfg.topk=10 run
    # under k=20 would silently truncate DCG and cap recall's numerator
    run_cfg = (
        dataclasses.replace(cfg, topk=k) if k > cfg.topk else cfg
    )
    qterms = [(qid, sorted(set(tokenize(text)))) for qid, text in queries]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    run = search(index_dir, qds, run_cfg).to_pandas()
    run_docs: dict[int, np.ndarray] = {}
    if len(run):
        run = run[run["rank"] < k]
        run_docs = {
            int(q): g.sort_values("rank")["doc_id"].to_numpy().astype(np.uint64)
            for q, g in run.groupby("query_id")
        }
    parts = docs_ds.map_batches(
        _grade_partials(qterms, run_docs, k), batch_format="pyarrow"
    ).to_pandas()

    disc = 1.0 / np.log2(np.arange(k) + 2.0)
    rows = []
    for qid, _ in queries:
        g = parts[parts["query_id"] == qid]
        n_rel = int(g.loc[g["kind"] == 0, "val"].sum())
        top = np.sort(g.loc[g["kind"] == 1, "val"].to_numpy())[::-1][:k]
        grades = dict(
            zip(
                g.loc[g["kind"] == 2, "doc_id"].to_numpy().astype(np.uint64),
                g.loc[g["kind"] == 2, "val"].to_numpy(),
            )
        )
        docs = run_docs.get(qid, np.empty(0, dtype=np.uint64))
        rel_at = np.array([int(grades.get(d, 0)) for d in docs], dtype=np.int64)
        gains = np.power(2.0, rel_at) - 1.0
        dcg = float((gains * disc[: rel_at.size]).sum())
        igains = np.power(2.0, top.astype(np.float64)) - 1.0
        idcg = float((igains * disc[: top.size]).sum())
        ndcg = dcg / idcg if idcg > 0 else 0.0
        first = np.flatnonzero(rel_at > 0)
        mrr = 1.0 / (int(first[0]) + 1) if first.size else 0.0
        hits = int((rel_at > 0).sum())
        recall = hits / n_rel if n_rel else 0.0
        rows.append((qid, n_rel, hits, ndcg, mrr, recall))
    return pd.DataFrame(
        rows, columns=["query_id", "n_rel", "hits", "ndcg", "mrr", "recall"]
    )


def eval_err(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    k: int = 10,
) -> pd.DataFrame:
    """(query_id, g_max, err): Expected Reciprocal Rank at cutoff
    ``k`` (Chapelle et al. 2009) for the engine's own BM25 run — the
    cascade-model metric: a user scans ranks top-down, stops at rank
    r with probability R_r = (2^g_r - 1) / 2^g_max, and ERR is the
    expected reciprocal stopping rank:

        ERR@k = sum_r (1/r) * R_r * prod_{i<r} (1 - R_i)

    Same streamed qrels machinery as eval_search_quality (one
    documents pass, per-block partials); ``g_max`` is the query's
    global maximum term-overlap grade (recovered exactly from the
    merged per-block top grades).  The cascade product runs in rank
    order (np.cumprod), replayed by the oracle's product() window;
    a query with no relevant documents has ERR 0."""
    import ray.data

    from mini_ivf_ray.pipelines.query import search

    import dataclasses

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    run_cfg = dataclasses.replace(cfg, topk=k) if k > cfg.topk else cfg
    qterms = [(qid, sorted(set(tokenize(text)))) for qid, text in queries]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    run = search(index_dir, qds, run_cfg).to_pandas()
    run_docs: dict[int, np.ndarray] = {}
    if len(run):
        run = run[run["rank"] < k]
        run_docs = {
            int(q): g.sort_values("rank")["doc_id"].to_numpy().astype(np.uint64)
            for q, g in run.groupby("query_id")
        }
    parts = docs_ds.map_batches(
        _grade_partials(qterms, run_docs, k), batch_format="pyarrow"
    ).to_pandas()

    rows = []
    for qid, _ in queries:
        g = parts[parts["query_id"] == qid]
        top = np.sort(g.loc[g["kind"] == 1, "val"].to_numpy())[::-1]
        gmax = int(top[0]) if top.size else 0
        grades = dict(
            zip(
                g.loc[g["kind"] == 2, "doc_id"].to_numpy().astype(np.uint64),
                g.loc[g["kind"] == 2, "val"].to_numpy(),
            )
        )
        docs = run_docs.get(qid, np.empty(0, dtype=np.uint64))
        if gmax == 0 or not docs.size:
            rows.append((qid, gmax, 0.0))
            continue
        rel_at = np.array(
            [int(grades.get(d, 0)) for d in docs], dtype=np.int64
        )
        rr = (np.power(2.0, rel_at) - 1.0) / np.float64(2.0**gmax)
        prior = np.concatenate([[1.0], np.cumprod(1.0 - rr)[:-1]])
        err = float(
            np.sum(rr * prior / (np.arange(rel_at.size) + 1.0))
        )
        rows.append((qid, gmax, err))
    return pd.DataFrame(rows, columns=["query_id", "g_max", "err"])
