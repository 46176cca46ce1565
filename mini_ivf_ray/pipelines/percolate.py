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


def _conjunctive_candidates(toks, bundle):
    """(doc_idx, query_pos) pairs where the doc contains ALL of the
    query's distinct terms — the shared candidate kernel of term and
    phrase percolation (vectorized CSR walk, sparse unique/counts,
    never a dense docs x rules matrix)."""
    terms_b, offs_b, flatq_b, need_b, _qids_b = bundle
    d_idx: list[int] = []
    d_terms: list[str] = []
    for i, tk in enumerate(toks):
        s = set(tk)
        d_terms.extend(s)
        d_idx.extend([i] * len(s))
    if not d_terms:
        e = np.empty(0, dtype=np.int64)
        return e, e
    t_arr = np.array(d_terms, dtype=object)
    i_arr = np.array(d_idx, dtype=np.int64)
    pos = np.searchsorted(terms_b, t_arr)
    np.minimum(pos, terms_b.size - 1, out=pos)
    hit = terms_b[pos] == t_arr
    pos, i_arr = pos[hit], i_arr[hit]
    starts = offs_b[pos]
    counts = offs_b[pos + 1] - starts
    total = int(counts.sum())
    if not total:
        e = np.empty(0, dtype=np.int64)
        return e, e
    cum = np.cumsum(counts)
    inc = np.arange(total, dtype=np.int64) - np.repeat(cum - counts, counts)
    gather = np.repeat(starts, counts) + inc
    rep_doc = np.repeat(i_arr, counts)
    rep_q = flatq_b[gather]
    key = rep_doc * need_b.size + rep_q
    uk, cnts = np.unique(key, return_counts=True)
    full = cnts == need_b[uk % need_b.size]
    sel = uk[full]
    return sel // need_b.size, sel % need_b.size


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

        bundle_b = _ray.get(bundle_ref)
        qids_b = bundle_b[4]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks, _ = tokenize_batch(batch["text"].to_pylist())
        didx, qpos = _conjunctive_candidates(toks, bundle_b)
        out_d = np.asarray(ids, dtype=np.uint64)[didx]
        out_q = qids_b[qpos]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(match, batch_format="pyarrow").to_pandas()


def percolate_phrases(
    docs_ds, stored_phrases: list[tuple[int, str]]
) -> "pd.DataFrame":
    """Phrase percolation (ES percolator with stored ``match_phrase``
    queries): (doc_id, query_id) for every stored phrase occurring
    CONTIGUOUSLY, in order, in the document's token stream.

    The percolator's own two-stage plan: stage 1 is the shared
    conjunctive candidate kernel (a doc can only contain the phrase
    if it contains all its distinct terms — exactly ES's term
    extraction from stored queries); stage 2 verifies each candidate
    (doc, rule) pair positionally with the token-stream phrase kernel
    (phrase.contains_phrase).  Candidates are term-filtered and
    rule-tables are thousands-sized, so the verify loop touches only
    plausible pairs — the same candidate-only argument as phrase
    search.  Everything stays ONE stateless streamed pass, zero
    shuffle; a rule with no tokens matches nothing; a single-token
    phrase degenerates to term percolation (pytest-pinned)."""
    import ray

    from mini_ivf_ray.pipelines.phrase import contains_phrase

    seqs = {
        int(qid): tokenize(text) for qid, text in stored_phrases
    }
    seqs = {q: ts for q, ts in seqs.items() if ts}
    if not seqs:
        return pd.DataFrame(columns=["doc_id", "query_id"])
    # candidate bundle over DISTINCT terms (the term-percolate CSR)
    term_to_qs: dict[str, list[int]] = {}
    for q, ts in seqs.items():
        for t in sorted(set(ts)):
            term_to_qs.setdefault(t, []).append(q)
    terms_sorted = sorted(term_to_qs)
    flat_q: list[int] = []
    offs = [0]
    for t in terms_sorted:
        flat_q.extend(term_to_qs[t])
        offs.append(len(flat_q))
    qids_sorted = sorted(seqs)
    need = np.array(
        [len(set(seqs[q])) for q in qids_sorted], dtype=np.int64
    )
    qindex = {q: i for i, q in enumerate(qids_sorted)}
    bundle = (
        np.array(terms_sorted, dtype=object),
        np.array(offs, dtype=np.int64),
        np.array([qindex[q] for q in flat_q], dtype=np.int64),
        need,
        np.array(qids_sorted, dtype=np.int64),
    )
    phrases_by_pos = [seqs[q] for q in qids_sorted]
    bundle_ref = ray.put((bundle, phrases_by_pos))

    def match(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bundle_b, phrases_b = _ray.get(bundle_ref)
        qids_b = bundle_b[4]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks, _ = tokenize_batch(batch["text"].to_pylist())
        didx, qpos = _conjunctive_candidates(toks, bundle_b)
        out_d, out_q = [], []
        for di, qi in zip(didx, qpos):
            if contains_phrase(toks[int(di)], phrases_b[int(qi)]):
                out_d.append(int(ids[int(di)]))
                out_q.append(int(qids_b[int(qi)]))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
                "query_id": pa.array(out_q, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(match, batch_format="pyarrow").to_pandas()
