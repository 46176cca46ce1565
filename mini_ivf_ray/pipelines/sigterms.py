"""Significant-terms aggregation: what is a result set ABOUT?

Elasticsearch's ``significant_terms``: for each query, rank vocabulary
terms by how over-represented they are in the query's (disjunctive)
match set relative to the corpus background — the "uncommonly common"
terms that characterize a result set, the engine-side topic-discovery
primitive.  Score here is the lift ratio

    score(t) = (fg_df / |match|) / (df / N)

with fg_df = docs in the match set containing t (doc frequencies on
both sides, ES-style).  All inputs are exact integers and the score is
three IEEE divisions in fixed order, so numpy and the SQL oracle
produce identical doubles; ranking ties break term-asc.

Ray-Data-first shape (the evaluation.py pattern): the (tiny) query
term sets are broadcast in the UDF closure; ONE ``map_batches`` pass
streams the documents, determines match membership by term overlap
(no index fetch, no match-set broadcast — a stopword query's match
set never materializes anywhere), and emits per-block PARTIALS:
(query, term, fg_count) over deduplicated doc terms plus a per-block
match count.  The partials are merged either on the driver (small runs:
blocks x block-vocab rows) or by a distributed
``groupby(query_id, term).sum`` combiner — ``combine="auto"`` picks the
combiner when the estimated partial volume exceeds ``combine_threshold``
rows, so at 100-TB scale the driver only ever sees the already-combined
(queries x vocab) aggregate.  Both paths are exact integer sums and
produce identical results (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize, tokenize_batch
from mini_ivf_ray.state.stats import CorpusStats


def _sig_partials(qterms: list[tuple[int, frozenset]]):
    """Batch-UDF factory: per-block (query_id, term, c) partials — the
    match-count partial rides as the reserved term \"\"."""

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks, _ = tokenize_batch(texts)
        sets = [set(tk) for tk in toks]
        out_q, out_t, out_c = [], [], []
        for qid, qt in qterms:
            if not qt:
                continue
            hit = [s for s in sets if not qt.isdisjoint(s)]
            out_q.append(qid)
            out_t.append("")
            out_c.append(len(hit))
            if hit:
                cnt: dict[str, int] = {}
                for s in hit:
                    for t in s:
                        cnt[t] = cnt.get(t, 0) + 1
                out_q.extend([qid] * len(cnt))
                out_t.extend(cnt.keys())
                out_c.extend(cnt.values())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "term": pa.array(out_t, type=pa.string()),
                "c": pa.array(out_c, type=pa.int64()),
            }
        )

    return partials


def significant_terms(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    topn: int = 10,
    combine: str = "auto",
    combine_threshold: int = 2_000_000,
) -> pd.DataFrame:
    """(query_id, rank, term, fg, m, score) — per query the ``topn``
    vocabulary terms by lift over the corpus background; ``fg`` = match
    docs containing the term, ``m`` = match-set size.  Stats (df, N)
    come from the committed index sidecar.

    ``combine``: "driver" pulls raw per-block partials to the driver
    (blocks x block-vocab rows — fine at bench scale); "distributed"
    pre-merges them with ``groupby(query_id, term).sum`` so the driver
    receives at most (queries x vocab) combined rows regardless of
    block count; "auto" picks "distributed" when the estimated partial
    volume (input blocks x queries x vocab upper bound) exceeds
    ``combine_threshold``.  Integer sums either way — identical output."""
    stats = CorpusStats.load(index_dir)
    qterms = [
        (qid, frozenset(tokenize(text))) for qid, text in queries
    ]
    parts_ds = docs_ds.map_batches(
        _sig_partials(qterms), batch_format="pyarrow"
    )
    if combine == "auto":
        try:
            n_blocks = max(1, len(docs_ds.input_files()))
        except Exception:
            n_blocks = 8
        est = n_blocks * max(1, len(queries)) * max(1, len(stats.df))
        combine = "distributed" if est > combine_threshold else "driver"
    if combine == "distributed":
        merged = parts_ds.groupby(["query_id", "term"]).sum("c").to_pandas()
        parts = merged.rename(columns={"sum(c)": "c"})
    elif combine == "driver":
        parts = parts_ds.to_pandas()
    else:
        raise ValueError(f"unknown combine mode: {combine!r}")
    rows = []
    n_docs = float(stats.n_docs)
    for qid, _ in queries:
        g = parts[parts["query_id"] == qid]
        m = int(g.loc[g["term"] == "", "c"].sum())
        if not m:
            continue
        fg = g[g["term"] != ""].groupby("term")["c"].sum()
        terms = fg.index.to_numpy()
        fgv = fg.to_numpy().astype(np.float64)
        dfv = np.array(
            [stats.df.get(t, 0) for t in terms], dtype=np.float64
        )
        keep = dfv > 0  # vocabulary terms only (index-known)
        terms, fgv, dfv = terms[keep], fgv[keep], dfv[keep]
        score = (fgv / m) / (dfv / n_docs)
        order = np.argsort(terms, kind="stable")
        order = order[np.argsort(-score[order], kind="stable")][:topn]
        for r, i in enumerate(order):
            rows.append(
                (qid, r, str(terms[i]), int(fgv[i]), m, float(score[i]))
            )
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "term", "fg", "m", "score"]
    )


def _bg_partials(col: str, val: str):
    """Batch-UDF factory: per-block (term, c) distinct-doc counts over
    the BACKGROUND-filter-matching docs — the reserved term \"\" rides
    the filtered-doc count."""

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = batch.filter(pc.equal(batch[col], val))
        texts = sel["text"].to_pylist()
        toks, _ = tokenize_batch(texts)
        cnt: dict[str, int] = {}
        for tk in toks:
            for t in set(tk):
                cnt[t] = cnt.get(t, 0) + 1
        terms = [""] + list(cnt.keys())
        cs = [len(texts)] + list(cnt.values())
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "c": pa.array(cs, type=pa.int64()),
            }
        )

    return partials


def significant_terms_filtered_background(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    background: tuple[str, str],
    topn: int = 10,
) -> pd.DataFrame:
    """ES ``significant_terms`` with ``background_filter``: the
    foreground stays the query's match set over the WHOLE corpus, but
    lift is measured against a FILTERED background — df and N counted
    over only the docs matching ``background = (column, value)`` —
    "what's significant here relative to English pages", not relative
    to everything.

    Scale shape: the unchanged foreground partial pass plus ONE extra
    streamed background pass emitting per-block (term, distinct-doc
    count) partials (block-vocab rows; the same combiner-first
    argument as the main operator — feed them to a
    ``groupby(term).sum`` when blocks x vocab grows); driver merges
    two panel-sized frames.  Pinned divergence handling: a foreground
    term ABSENT from the filtered background has no finite lift and
    is EXCLUDED from the ranking (ES's heuristic scorers smooth it;
    the exact-lift contract here refuses to divide by zero loudly by
    construction)."""
    col, val = background
    qterms = [(qid, frozenset(tokenize(text))) for qid, text in queries]
    fg_parts = docs_ds.map_batches(
        _sig_partials(qterms), batch_format="pyarrow"
    ).to_pandas()
    bg_parts = docs_ds.map_batches(
        _bg_partials(col, val), batch_format="pyarrow"
    ).to_pandas()
    bg = (
        bg_parts.groupby("term")["c"].sum()
        if len(bg_parts)
        else pd.Series(dtype=np.int64)
    )
    bg_n = float(bg.get("", 0))
    rows = []
    for qid, _ in queries:
        g = fg_parts[fg_parts["query_id"] == qid]
        m = int(g.loc[g["term"] == "", "c"].sum())
        if not m or not bg_n:
            continue
        fg = g[g["term"] != ""].groupby("term")["c"].sum()
        terms = fg.index.to_numpy()
        fgv = fg.to_numpy().astype(np.float64)
        dfv = np.array(
            [float(bg.get(t, 0)) for t in terms], dtype=np.float64
        )
        keep = dfv > 0  # background-absent terms have no finite lift
        terms, fgv, dfv = terms[keep], fgv[keep], dfv[keep]
        score = (fgv / m) / (dfv / bg_n)
        order = np.argsort(terms, kind="stable")
        order = order[np.argsort(-score[order], kind="stable")][:topn]
        for r, i in enumerate(order):
            rows.append(
                (qid, r, str(terms[i]), int(fgv[i]), m, float(score[i]))
            )
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "term", "fg", "m", "score"]
    )
