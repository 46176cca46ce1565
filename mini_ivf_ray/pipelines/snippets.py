"""Snippet generation (keyword-in-context) for retrieval results.

Search-result presentation the fulltext engine needs next to ranking:
for each (query, ranked doc) pair, a deterministic text window around
the first occurrence of the MOST SELECTIVE query term the document
contains (lowest corpus df = highest idf; term-asc tie-break), built
from the same pinned tokenizer as the index so the snippet rule is
exactly SQL-replayable (DuckDB list_position + list slicing).

Ray-Data-first shape: the result set (query_id, doc_id, rank) and the
query-term df table are tiny — broadcast ONCE via ray.put — and ONE
column-pruned pass over the documents table emits snippets for the
docs that appear in any result (zero shuffle; the documents side
streams, never the other way around).  A doc ranked under several
queries emits one row per (query_id, doc_id).

The reference has no text analog (vector-only); this extends the
query-side surface like phrase search and spell correction do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize


def snippet_for_tokens(
    toks: list[str],
    qterms: list[tuple[str, int]],
    window: int = 3,
) -> tuple[str, str] | None:
    """(best_term, snippet) for one document, or None when no query
    term occurs.  ``qterms`` is [(term, df)] — best = min (df, term);
    snippet = tokens[p-window .. p+window] (1-based inclusive, clipped)
    around the FIRST occurrence of the best term, space-joined —
    exactly DuckDB's tl[greatest(1, p-w) : least(len(tl), p+w)]."""
    best = None
    for term, df in qterms:
        try:
            p = toks.index(term) + 1  # 1-based, first occurrence
        except ValueError:
            continue
        key = (df, term)
        if best is None or key < best[0]:
            best = (key, term, p)
    if best is None:
        return None
    _, term, p = best
    lo = max(1, p - window) - 1
    hi = min(len(toks), p + window)
    return term, " ".join(toks[lo:hi])


def snippets_for_results(
    docs_ds,
    results: pd.DataFrame,
    query_terms: dict[int, list[tuple[str, int]]],
    window: int = 3,
) -> pd.DataFrame:
    """(query_id, doc_id, rank, term, snippet) for every result row.

    ``results``: (query_id, doc_id, rank) — the top-k output of
    pipelines/query.search.  ``query_terms``: query_id -> [(term, df)]
    with the CORPUS df (from the index stats) per distinct query term.
    ``docs_ds``: the documents Dataset with (doc_id, text)."""
    import ray

    need: dict[int, list[tuple[int, int]]] = {}
    for qid, did, rank in results[["query_id", "doc_id", "rank"]].itertuples(
        index=False
    ):
        need.setdefault(int(did), []).append((int(qid), int(rank)))
    bundle_ref = ray.put((need, dict(query_terms), int(window)))

    def emit(batch: pa.Table) -> pa.Table:
        import ray as _ray

        need_b, qt, w = _ray.get(bundle_ref)
        ids = batch["doc_id"].to_numpy()
        out = {"query_id": [], "doc_id": [], "rank": [],
               "term": [], "snippet": []}
        hit_pos = [i for i, d in enumerate(ids) if int(d) in need_b]
        if hit_pos:
            texts = batch["text"].take(pa.array(hit_pos)).to_pylist()
            for i, text in zip(hit_pos, texts):
                toks = tokenize(text)
                for qid, rank in need_b[int(ids[i])]:
                    got = snippet_for_tokens(toks, qt.get(qid, []), w)
                    if got is None:
                        continue
                    term, snip = got
                    out["query_id"].append(qid)
                    out["doc_id"].append(int(ids[i]))
                    out["rank"].append(rank)
                    out["term"].append(term)
                    out["snippet"].append(snip)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "rank": pa.array(out["rank"], type=pa.int64()),
                "term": pa.array(out["term"], type=pa.string()),
                "snippet": pa.array(out["snippet"], type=pa.string()),
            }
        )

    got = docs_ds.map_batches(emit, batch_format="pyarrow").to_pandas()
    if "query_id" not in got.columns:
        got = pd.DataFrame(
            columns=["query_id", "doc_id", "rank", "term", "snippet"]
        )
    return got.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )
