"""Percolation: reverse search — match documents against stored queries.

Elasticsearch's percolator inverted: instead of "which docs match this
query", answer "which STORED queries match this doc" for every doc in
a stream.  The workhorse of rule-based corpus routing at training-data
scale: topic filters, alerting rules, licensing/denylist tags — each a
stored conjunctive term query; every incoming document needs the set
of rules it triggers.

Ray-Data-first shape: stored queries are tokenized ONCE driver-side
into a flat (term -> [(query, n_terms_of_query)]) table and broadcast
(``ray.put``); ONE ``map_batches`` pass streams the documents, builds
each batch's deduplicated (doc, term) pairs, joins them against the
broadcast term table with ``np.isin`` + searchsorted gathers, and
counts matched terms per (doc, query) with one ``bincount`` — a doc
matches a query iff it contains ALL the query's distinct terms
(conjunctive, the percolator default).  Zero shuffle; output is the
slim (doc_id, query_id) match list.

Scale note: the stored-query table is rule-sized (thousands), never
corpus-sized — broadcasting it is the textbook small-side pattern;
the stream side stays a single stateless pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize, tokenize_batch


def percolate(docs_ds, stored_queries: list[tuple[int, str]]) -> "pd.DataFrame":
    """(doc_id, query_id) for every stored conjunctive query whose
    DISTINCT terms all appear in the document.  A query with no tokens
    matches nothing."""
    import ray

    qterms = {
        qid: sorted(set(tokenize(text))) for qid, text in stored_queries
    }
    qterms = {q: ts for q, ts in qterms.items() if ts}
    if not qterms:
        return pd.DataFrame(columns=["doc_id", "query_id"])
    # flat broadcast table: sorted unique terms + per-term query lists
    term_to_qs: dict[str, list[int]] = {}
    for q, ts in qterms.items():
        for t in ts:
            term_to_qs.setdefault(t, []).append(q)
    terms_sorted = sorted(term_to_qs)
    # CSR layout over terms: offsets into a flat query-id array
    flat_q: list[int] = []
    offs = [0]
    for t in terms_sorted:
        flat_q.extend(term_to_qs[t])
        offs.append(len(flat_q))
    qids_sorted = sorted(qterms)
    need = np.array([len(qterms[q]) for q in qids_sorted], dtype=np.int64)
    qindex = {q: i for i, q in enumerate(qids_sorted)}
    bundle = (
        np.array(terms_sorted, dtype=object),
        np.array(offs, dtype=np.int64),
        np.array([qindex[q] for q in flat_q], dtype=np.int64),
        need,
        np.array(qids_sorted, dtype=np.int64),
    )
    bundle_ref = ray.put(bundle)

    def match(batch: pa.Table) -> pa.Table:
        import ray as _ray

        terms_b, offs_b, flatq_b, need_b, qids_b = _ray.get(bundle_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks, _ = tokenize_batch(batch["text"].to_pylist())
        # deduplicated (doc_idx, term) pairs
        d_idx: list[int] = []
        d_terms: list[str] = []
        for i, tk in enumerate(toks):
            s = set(tk)
            d_terms.extend(s)
            d_idx.extend([i] * len(s))
        out_d, out_q = [], []
        if d_terms:
            t_arr = np.array(d_terms, dtype=object)
            i_arr = np.array(d_idx, dtype=np.int64)
            pos = np.searchsorted(terms_b, t_arr)
            np.minimum(pos, terms_b.size - 1, out=pos)
            hit = terms_b[pos] == t_arr
            pos, i_arr = pos[hit], i_arr[hit]
            # expand each (doc, term) hit to its term's query list —
            # vectorized CSR walk (no per-hit Python)
            starts = offs_b[pos]
            counts = offs_b[pos + 1] - starts
            total = int(counts.sum())
            if total:
                cum = np.cumsum(counts)
                inc = np.arange(total, dtype=np.int64) - np.repeat(
                    cum - counts, counts
                )
                gather = np.repeat(starts, counts) + inc
                rep_doc = np.repeat(i_arr, counts)
                rep_q = flatq_b[gather]
                # matched-term count per OCCUPIED (doc, query) pair —
                # sparse unique/counts, never a dense docs x rules
                # matrix (rule tables are thousands-sized by design)
                key = rep_doc * need_b.size + rep_q
                uk, cnts = np.unique(key, return_counts=True)
                full = cnts == need_b[uk % need_b.size]
                sel = uk[full]
                out_d = np.asarray(ids, dtype=np.uint64)[sel // need_b.size]
                out_q = qids_b[sel % need_b.size]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(match, batch_format="pyarrow").to_pandas()
