"""Phrase (exact token-sequence) search.

Two verify backends share one plan (conjunctive candidates first,
positional check second):

* **positions store** (``positions="index"`` / ``"auto"`` when fresh) —
  the optional positional payload (pipelines/positions.py; reference
  analog: the packed per-list payloads of index_ivfpq.hpp:157) lets the
  check run INDEX-ONLY: candidate docs' per-term position arrays are
  read from the doc-hash-partitioned store and intersected — no
  document text is touched at query time.
* **corpus verify** (``positions="corpus"``, and the fallback when no
  fresh store exists) — the classic positionless-engine plan below.

The base index stores no positions (like the reference's postings,
index_ivfpq.cpp:83-120, which keep only per-cluster id/payload), so
corpus-verify phrase matching is the classic two-stage plan every
positional-less engine uses:

1. **Candidate generation from the index** — the phrase's distinct
   terms are intersected conjunctively (``conjunctive_matches``): a doc
   can only contain the phrase if it contains every term.  This is
   index-only work and prunes the corpus to the AND set.
2. **Distributed verify over the corpus** — one ``map_batches`` pass
   over the documents dataset, filtered to candidate ids (broadcast as
   a sorted uint64 numpy array via ``ray.put`` — 8 bytes/candidate;
   the batch-side membership test is one ``np.isin``).  Each surviving
   doc is re-tokenized with the indexing tokenizer and scanned for the
   phrase as a CONTIGUOUS token subsequence (vectorized first-token
   match + per-hit window compare).

Ranking: verified docs keep their conjunctive BM25 score (sum over the
phrase's distinct terms — the same float64 accumulation as every other
query path), so phrase results order exactly like the equivalent AND
query restricted to true phrase hits.

Scale note: the broadcast candidate-id array is the partitioning
assumption — candidates ≪ corpus (AND of ≥2 terms).  A single-stopword
"phrase" degenerates to one term and skips verify entirely (any
occurrence IS the phrase).  At 10^8+ candidates the id array is ~1 GB
in plasma, still one object read zero-copy by every verify task; beyond
that, flip to a bucketed semi-join on id hash (the jaccard-verify
pattern, dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize, tokenize_batch
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact


def contains_phrase(tokens: list[str], phrase: list[str]) -> bool:
    """Exact contiguous subsequence test over token lists."""
    n, m = len(tokens), len(phrase)
    if m == 0 or n < m:
        return False
    first = phrase[0]
    # vectorized first-token positions, then window compare per hit
    arr = np.array(tokens, dtype=object)
    hits = np.flatnonzero(arr[: n - m + 1] == first)
    return any(tokens[i : i + m] == phrase for i in hits)


class _PhraseVerifier:
    """Verify stage: batch -> (query_id, doc_id) rows for docs whose
    token stream contains the phrase.  Candidate ids + phrases ship
    once per actor via the object store (zero-copy for the id array)."""

    def __init__(self, cand_ref, phrases: list[tuple[int, list[str]]]):
        import ray

        self.cand = ray.get(cand_ref)  # {qid: sorted uint64 ids}
        self.phrases = phrases

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        any_mask = np.zeros(len(doc_ids), dtype=bool)
        per_q = {}
        for qid, _ in self.phrases:
            ids = self.cand.get(qid)
            if ids is None or not ids.size:
                continue
            m = np.isin(doc_ids, ids, assume_unique=False)
            if m.any():
                per_q[qid] = m
                any_mask |= m
        out_q: list[int] = []
        out_d: list[int] = []
        if per_q:
            rows = np.flatnonzero(any_mask)
            texts = batch["text"].take(pa.array(rows)).to_pylist()
            toks, _ = tokenize_batch(texts)
            row_tokens = dict(zip(rows.tolist(), toks))
            for qid, phrase in self.phrases:
                m = per_q.get(qid)
                if m is None:
                    continue
                for i in np.flatnonzero(m).tolist():
                    if contains_phrase(row_tokens[i], phrase):
                        out_q.append(qid)
                        out_d.append(int(doc_ids[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def _resolve_positions_mode(index_dir: str, positions: str) -> bool:
    """-> use the index positions store?  ``"index"`` demands a FRESH
    store (raises otherwise — a stale store is never silently trusted),
    ``"auto"`` uses it iff fresh, ``"corpus"`` never."""
    if positions == "corpus":
        return False
    from mini_ivf_ray.pipelines.positions import positions_fresh

    fresh = positions_fresh(index_dir)
    if positions == "index":
        if not fresh:
            raise FileNotFoundError(
                f"positions='index' but no FRESH positions store under "
                f"{index_dir} (build_positions after every corpus change)"
            )
        return True
    if positions == "auto":
        return fresh
    raise ValueError(f"unknown positions mode: {positions!r}")


def phrase_topk(
    index_dir: str,
    docs_ds,
    phrases: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """Top-k phrase search: (query_id, rank, doc_id, score) for docs
    containing each phrase as a contiguous token sequence, ranked by
    the conjunctive BM25 score (score desc, doc_id asc).

    ``positions``: "index" verifies from the positions store only
    (``docs_ds`` may be None), "corpus" re-tokenizes candidate docs
    from ``docs_ds``, "auto" (default) prefers a fresh store.  Both
    backends are exact and pytest-pinned identical.
    """
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    tokenized = [(qid, tokenize(text)) for qid, text in phrases]
    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list[str]]] = []
    for qid, toks in tokenized:
        docs, scores = searcher.conjunctive_matches_for_text(" ".join(toks))
        cand[qid] = docs
        cand_scores[qid] = dict(zip(docs.tolist(), scores.tolist()))
        # single-token phrases (after tokenization) need no position
        # check: every conjunctive match contains the "phrase"
        if len(toks) > 1 and docs.size:
            needs_verify.append((qid, toks))

    verified: dict[int, np.ndarray] = {
        qid: cand[qid] for qid, toks in tokenized if len(toks) == 1
    }
    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(index_dir, cand, needs_verify, "phrase", cfg)
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _ in needs_verify})
        hits = (
            docs_ds.map_batches(
                _PhraseVerifier,
                fn_constructor_args=(cand_ref, needs_verify),
                batch_format="pyarrow",
                concurrency=(1, cfg.query_concurrency),
                num_cpus=1,
            )
            .to_pandas()
        )
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(grp["doc_id"].to_numpy().astype(np.uint64))

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, _ in tokenized:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(d)
            out["score"].append(s)
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


def within_window(tokens: list[str], terms: list[str], w: int) -> bool:
    """True iff some window of <= ``w`` consecutive tokens contains at
    least one occurrence of EVERY distinct term (unordered proximity —
    the minimal-cover-window test, two-pointer sliding over the query
    terms' positions only, O(occurrences))."""
    need = dict.fromkeys(terms)
    if not need or w <= 0:
        return False
    if len(need) == 1:
        t0 = next(iter(need))
        return t0 in tokens
    pos = [(i, t) for i, t in enumerate(tokens) if t in need]
    cnt: dict[str, int] = {}
    covered, lo = 0, 0
    for hi in range(len(pos)):
        t = pos[hi][1]
        cnt[t] = cnt.get(t, 0) + 1
        if cnt[t] == 1:
            covered += 1
        while covered == len(need):
            if pos[hi][0] - pos[lo][0] + 1 <= w:
                return True
            tl = pos[lo][1]
            cnt[tl] -= 1
            if cnt[tl] == 0:
                covered -= 1
            lo += 1
    return False


class _ProximityVerifier:
    """Verify stage for proximity search: batch -> (query_id, doc_id)
    rows for candidate docs whose token stream covers all the query's
    distinct terms within the query's window.  Same broadcast shape as
    _PhraseVerifier."""

    def __init__(self, cand_ref, queries: list[tuple[int, list[str], int]]):
        import ray

        self.cand = ray.get(cand_ref)  # {qid: sorted uint64 ids}
        self.queries = queries  # (qid, distinct terms, window)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        any_mask = np.zeros(len(doc_ids), dtype=bool)
        per_q = {}
        for qid, _terms, _w in self.queries:
            ids = self.cand.get(qid)
            if ids is None or not ids.size:
                continue
            m = np.isin(doc_ids, ids, assume_unique=False)
            if m.any():
                per_q[qid] = m
                any_mask |= m
        out_q: list[int] = []
        out_d: list[int] = []
        if per_q:
            rows = np.flatnonzero(any_mask)
            texts = batch["text"].take(pa.array(rows)).to_pylist()
            toks, _ = tokenize_batch(texts)
            row_tokens = dict(zip(rows.tolist(), toks))
            for qid, terms, w in self.queries:
                m = per_q.get(qid)
                if m is None:
                    continue
                for i in np.flatnonzero(m).tolist():
                    if within_window(row_tokens[i], terms, w):
                        out_q.append(qid)
                        out_d.append(int(doc_ids[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def proximity_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str, int]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """Unordered proximity search: (query_id, rank, doc_id, score) for
    docs whose token stream contains every distinct query term inside
    some window of <= w consecutive tokens, ranked by the conjunctive
    BM25 score.  ``queries``: (query_id, text, window).

    Same two-stage plan and ``positions`` backends as phrase_topk —
    only the per-doc predicate differs (minimal cover window instead of
    contiguous subsequence)."""
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    tokenized = [
        (qid, sorted(set(tokenize(text))), w) for qid, text, w in queries
    ]
    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list[str], int]] = []
    for qid, terms, w in tokenized:
        docs, scores = searcher.conjunctive_matches_for_text(" ".join(terms))
        cand[qid] = docs
        cand_scores[qid] = dict(zip(docs.tolist(), scores.tolist()))
        # single-term queries need no position check (any occurrence is
        # inside every window of w >= 1)
        if len(terms) > 1 and docs.size:
            needs_verify.append((qid, terms, w))

    verified: dict[int, np.ndarray] = {
        qid: cand[qid] for qid, terms, _w in tokenized if len(terms) == 1
    }
    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(index_dir, cand, needs_verify, "prox", cfg)
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _, _ in needs_verify})
        hits = docs_ds.map_batches(
            _ProximityVerifier,
            fn_constructor_args=(cand_ref, needs_verify),
            batch_format="pyarrow",
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        ).to_pandas()
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, _terms, _w in tokenized:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(d)
            out["score"].append(s)
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


class _OrderedVerifier:
    """Corpus-verify stage for ordered proximity: same broadcast shape
    as _ProximityVerifier, per-doc predicate = ordered_window_positions
    over positions derived from the token stream (identical kernel to
    the index-side path, so both backends agree by construction)."""

    def __init__(self, cand_ref, queries: list[tuple[int, list[str], int]]):
        import ray

        self.cand = ray.get(cand_ref)  # {qid: sorted uint64 ids}
        self.queries = queries  # (qid, tokens in query order, window)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from mini_ivf_ray.pipelines.positions import ordered_window_positions

        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        any_mask = np.zeros(len(doc_ids), dtype=bool)
        per_q = {}
        for qid, _toks, _w in self.queries:
            ids = self.cand.get(qid)
            if ids is None or not ids.size:
                continue
            m = np.isin(doc_ids, ids, assume_unique=False)
            if m.any():
                per_q[qid] = m
                any_mask |= m
        out_q: list[int] = []
        out_d: list[int] = []
        if per_q:
            rows = np.flatnonzero(any_mask)
            texts = batch["text"].take(pa.array(rows)).to_pylist()
            toks, _ = tokenize_batch(texts)
            row_tokens = dict(zip(rows.tolist(), toks))
            for qid, qtoks, w in self.queries:
                m = per_q.get(qid)
                if m is None:
                    continue
                for i in np.flatnonzero(m).tolist():
                    tk = row_tokens[i]
                    pos_by_term: dict[str, list[int]] = {}
                    for p, t in enumerate(tk):
                        if t in qtoks:
                            pos_by_term.setdefault(t, []).append(p)
                    pls = [
                        np.array(pos_by_term.get(t, ()), dtype=np.int32)
                        for t in qtoks
                    ]
                    if ordered_window_positions(pls, w):
                        out_q.append(qid)
                        out_d.append(int(doc_ids[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def ordered_proximity_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str, int]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """ORDERED proximity search (Lucene SpanNearQuery inOrder=true):
    docs containing the query tokens IN ORDER — positions p1 < p2 <
    ... < pk with pk - p1 + 1 <= w — ranked by the conjunctive BM25
    score over the distinct terms.  ``queries``: (query_id, text,
    window); token order is significant ("stream data" != "data
    stream"), duplicates allowed (strictly increasing positions).

    Same two-stage plan and ``positions`` backends as phrase_topk /
    proximity_topk — only the per-doc predicate differs (greedy ordered
    chain, positions.ordered_window_positions)."""
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    tokenized = [(qid, tokenize(text), w) for qid, text, w in queries]
    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list[str], int]] = []
    for qid, toks, w in tokenized:
        docs, scores = searcher.conjunctive_matches_for_text(" ".join(toks))
        cand[qid] = docs
        cand_scores[qid] = dict(zip(docs.tolist(), scores.tolist()))
        # a single-token query is trivially "in order"
        if len(toks) > 1 and docs.size:
            needs_verify.append((qid, toks, w))

    verified: dict[int, np.ndarray] = {
        qid: cand[qid] for qid, toks, _w in tokenized if len(toks) == 1
    }
    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(index_dir, cand, needs_verify, "ordered", cfg)
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _, _ in needs_verify})
        hits = docs_ds.map_batches(
            _OrderedVerifier,
            fn_constructor_args=(cand_ref, needs_verify),
            batch_format="pyarrow",
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        ).to_pandas()
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, _toks, _w in tokenized:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(d)
            out["score"].append(s)
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


def brute_force_phrase_topk(
    docs: pd.DataFrame,
    phrases: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
) -> pd.DataFrame:
    """Local exact oracle: scan every doc for the phrase, score with
    the conjunctive BM25 oracle, rank (score desc, doc_id asc)."""
    from mini_ivf_ray.pipelines.query import brute_force_topk

    cfg = cfg or PipelineConfig()
    # conjunctive scores for ALL matches: k widened to the corpus size
    import dataclasses

    wide = dataclasses.replace(cfg, topk=max(len(docs), 1))
    scored = brute_force_topk(docs, phrases, wide, mode="and")
    toks_per_doc = {
        int(d): tokenize(t) for d, t in zip(docs["doc_id"], docs["text"])
    }
    out_rows = []
    for qid, text in phrases:
        phrase = tokenize(text)
        sub = scored[scored["query_id"] == qid]
        keep = [
            (int(d), float(s))
            for d, s in zip(sub["doc_id"], sub["score"])
            if contains_phrase(toks_per_doc[int(d)], phrase)
        ]
        keep.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(keep[: cfg.topk]):
            out_rows.append((qid, r, d, s))
    df = pd.DataFrame(out_rows, columns=["query_id", "rank", "doc_id", "score"])
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


class _SpanFirstVerifier:
    """Corpus-verify stage for span_first: re-tokenize candidate docs
    and keep those whose term FIRST occurs before the query's limit."""

    def __init__(self, cand_ref, queries: list[tuple[int, list[str], int]]):
        import ray

        self.cand = ray.get(cand_ref)
        self.queries = queries
        # candidate union computed ONCE per actor (the _IndexPosVerifier
        # placement) — self.cand is fixed at construction
        nonempty = [v for v in self.cand.values() if v.size]
        self.union_cand = (
            np.unique(np.concatenate(nonempty))
            if nonempty
            else np.empty(0, dtype=np.uint64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        keep = np.isin(doc_ids, self.union_cand)
        out_q: list[int] = []
        out_d: list[int] = []
        if keep.any():
            texts = batch["text"].to_numpy(zero_copy_only=False)[keep]
            kept = doc_ids[keep]
            # dict keyed by doc id, NOT np.array(toks, dtype=object):
            # equal-length token lists would collapse that into a 2D
            # array whose rows are ndarrays without .index()
            toks = {int(d): tokenize(t) for d, t in zip(kept, texts)}
            for qid, terms, limit in self.queries:
                term = terms[0]
                ids = self.cand.get(qid)
                if ids is None or not ids.size:
                    continue
                for d in kept[np.isin(kept, ids)]:
                    tk = toks[int(d)]
                    try:
                        first = tk.index(term)
                    except ValueError:
                        continue
                    if first < limit:
                        out_q.append(qid)
                        out_d.append(int(d))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def span_first_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str, int]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """SpanFirst search (Lucene SpanFirstQuery): top-k docs whose term
    FIRST occurs within the opening ``limit`` token positions
    (first_pos < limit), ranked by the term's BM25 score (score desc,
    doc_id asc).  The title/lead-paragraph matching primitive.

    ``queries``: (query_id, term_text, limit) rows.  ``positions``:
    same backend contract as phrase_topk — "index" verifies from the
    positions store only (``docs_ds`` may be None; raises on a stale
    store), "corpus" re-tokenizes candidates, "auto" prefers a fresh
    store.  Candidates are the term's full posting list (conjunctive
    single-term match set), so verify work is candidate-proportional;
    single-token queries still need the position check, unlike
    phrase_topk's single-token fast path."""
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    tokenized: list[tuple[int, list[str], int]] = []
    for qid, text, limit in queries:
        toks = tokenize(text)
        if len(toks) != 1:
            raise ValueError(
                f"span_first_topk takes exactly one term per query, got "
                f"{text!r} for query {qid}"
            )
        tokenized.append((qid, toks, int(limit)))

    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list[str], int]] = []
    for qid, toks, limit in tokenized:
        docs, scores = searcher.conjunctive_matches_for_text(toks[0])
        cand[qid] = docs
        cand_scores[qid] = dict(zip(docs.tolist(), scores.tolist()))
        if docs.size and limit > 0:
            needs_verify.append((qid, toks, limit))

    verified: dict[int, np.ndarray] = {}
    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(index_dir, cand, needs_verify, "first", cfg)
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _, _ in needs_verify})
        hits = docs_ds.map_batches(
            _SpanFirstVerifier,
            fn_constructor_args=(cand_ref, needs_verify),
            batch_format="pyarrow",
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        ).to_pandas()
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out_rows = []
    for qid, _toks, _limit in tokenized:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out_rows.append((qid, r, d, s))
    df = pd.DataFrame(out_rows, columns=["query_id", "rank", "doc_id", "score"])
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


class _SpanNotVerifier:
    """Corpus-verify stage for span_not: re-tokenize candidate docs and
    keep those where ANY include-term occurrence has NO exclude-term
    occurrence within the query's window (the positions-store kernel,
    ``span_not_survives``, applied to token-stream positions)."""

    def __init__(self, cand_ref, queries: list[tuple[int, list[str], int]]):
        import ray

        self.cand = ray.get(cand_ref)
        self.queries = queries
        nonempty = [v for v in self.cand.values() if v.size]
        self.union_cand = (
            np.unique(np.concatenate(nonempty))
            if nonempty
            else np.empty(0, dtype=np.uint64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from mini_ivf_ray.pipelines.positions import span_not_survives

        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        keep = np.isin(doc_ids, self.union_cand)
        out_q: list[int] = []
        out_d: list[int] = []
        if keep.any():
            texts = batch["text"].to_numpy(zero_copy_only=False)[keep]
            kept = doc_ids[keep]
            toks = {int(d): tokenize(t) for d, t in zip(kept, texts)}
            for qid, terms, w in self.queries:
                inc_t, exc_t = terms[0], terms[1]
                ids = self.cand.get(qid)
                if ids is None or not ids.size:
                    continue
                for d in kept[np.isin(kept, ids)]:
                    tk = toks[int(d)]
                    inc = np.array(
                        [i for i, t in enumerate(tk) if t == inc_t],
                        dtype=np.int64,
                    )
                    exc = np.array(
                        [i for i, t in enumerate(tk) if t == exc_t],
                        dtype=np.int64,
                    )
                    if span_not_survives(inc, exc, w):
                        out_q.append(qid)
                        out_d.append(int(d))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def span_not_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str, str, int]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """SpanNot search (Lucene SpanNotQuery with symmetric pre/post
    slop): top-k docs with at least one INCLUDE-term occurrence that
    has no EXCLUDE-term occurrence within ``w`` token positions
    (|p_inc - p_exc| <= w excludes that occurrence), ranked by the
    include term's BM25 score (score desc, doc asc).  The negative
    phrase-context primitive ("apple" not near "pie").

    ``queries``: (query_id, include_text, exclude_text, w) rows; each
    text must tokenize to exactly one term.  ``positions``: the shared
    backend contract — "index" verifies from the positions store only
    (``docs_ds`` may be None; raises on a stale store), "corpus"
    re-tokenizes candidates, "auto" prefers a fresh store.  Candidates
    are the include term's posting list; an exclude term absent from a
    candidate doc excludes nothing there, so an OOV exclude term makes
    span_not == the plain single-term ranking (pytest-pinned).  Verify
    work is candidate-proportional in both backends."""
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    tokenized: list[tuple[int, list[str], int]] = []
    for qid, inc_text, exc_text, w in queries:
        inc = tokenize(inc_text)
        exc = tokenize(exc_text)
        if len(inc) != 1 or len(exc) != 1:
            raise ValueError(
                f"span_not_topk takes one include and one exclude term "
                f"per query, got {inc_text!r} / {exc_text!r} for query {qid}"
            )
        if w < 0:
            raise ValueError(f"window must be >= 0, got {w} for query {qid}")
        tokenized.append((qid, [inc[0], exc[0]], int(w)))

    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list[str], int]] = []
    for qid, terms, w in tokenized:
        docs, scores = searcher.conjunctive_matches_for_text(terms[0])
        cand[qid] = docs
        cand_scores[qid] = dict(zip(docs.tolist(), scores.tolist()))
        if docs.size:
            needs_verify.append((qid, terms, w))

    verified: dict[int, np.ndarray] = {}
    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(index_dir, cand, needs_verify, "not", cfg)
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _, _ in needs_verify})
        hits = docs_ds.map_batches(
            _SpanNotVerifier,
            fn_constructor_args=(cand_ref, needs_verify),
            batch_format="pyarrow",
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        ).to_pandas()
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out_rows = []
    for qid, _terms, _w in tokenized:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out_rows.append((qid, r, d, s))
    df = pd.DataFrame(out_rows, columns=["query_id", "rank", "doc_id", "score"])
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


class _SpanContainingVerifier:
    """Corpus-verify stage for span_containing: re-tokenize candidate
    docs, derive per-term positions from the token stream, and apply
    positions.containing_span_positions — the identical kernel the
    index backend runs, so both backends agree by construction."""

    def __init__(self, cand_ref, queries: list[tuple[int, list[str], int]]):
        import ray

        self.cand = ray.get(cand_ref)  # {qid: sorted uint64 ids}
        self.queries = queries  # (qid, big_tokens + [little], window)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from mini_ivf_ray.pipelines.positions import (
            containing_span_positions,
        )

        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        any_mask = np.zeros(len(doc_ids), dtype=bool)
        per_q = {}
        for qid, _terms, _w in self.queries:
            ids = self.cand.get(qid)
            if ids is None or not ids.size:
                continue
            m = np.isin(doc_ids, ids, assume_unique=False)
            if m.any():
                per_q[qid] = m
                any_mask |= m
        out_q: list[int] = []
        out_d: list[int] = []
        if per_q:
            rows = np.flatnonzero(any_mask)
            texts = batch["text"].take(pa.array(rows)).to_pylist()
            toks, _ = tokenize_batch(texts)
            row_tokens = dict(zip(rows.tolist(), toks))
            for qid, qterms, w in self.queries:
                m = per_q.get(qid)
                if m is None:
                    continue
                for i in np.flatnonzero(m).tolist():
                    tk = row_tokens[i]
                    pos_by_term: dict[str, list[int]] = {}
                    for p, t in enumerate(tk):
                        if t in qterms:
                            pos_by_term.setdefault(t, []).append(p)
                    pls = [
                        np.array(pos_by_term.get(t, ()), dtype=np.int32)
                        for t in qterms
                    ]
                    if containing_span_positions(pls[:-1], pls[-1], w):
                        out_q.append(qid)
                        out_d.append(int(doc_ids[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def span_containing_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str, str, int]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
    score_from: str = "big",
) -> pd.DataFrame:
    """SpanContaining / SpanWithin search (Lucene SpanContainingQuery /
    SpanWithinQuery): top-k docs where an ORDERED big-span window —
    positions p1 < ... < pk over the big terms in query order with
    pk - p1 + 1 <= w — CONTAINS an occurrence of the little term
    (p1 <= l <= pk).  The doc-level match set of the two Lucene
    queries is identical; only scoring differs, and ``score_from``
    pins it: "big" sums the big terms' BM25 contributions
    (SpanContaining scores the big spans), "little" scores the little
    term alone (SpanWithin scores the little spans).  Ranked
    (score desc, doc_id asc).

    ``queries``: (query_id, big_text, little_text, window) — big_text
    must tokenize to >= 2 tokens (a 1-term "span" is just the term;
    use span_first/plain search), little_text to exactly 1.
    Candidates are the conjunctive match set over big + little terms,
    so verify work is candidate-proportional; ``positions`` has the
    phrase_topk backend contract ("index" = positions store only,
    docs_ds may be None; "corpus" = re-tokenize; "auto")."""
    import ray

    if score_from not in ("big", "little"):
        raise ValueError(f"score_from must be big|little, got {score_from!r}")
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    tokenized: list[tuple[int, list[str], str, int]] = []
    for qid, big_text, little_text, w in queries:
        big = tokenize(big_text)
        little = tokenize(little_text)
        if len(big) < 2:
            raise ValueError(
                f"span_containing_topk needs >= 2 big terms, got "
                f"{big_text!r} for query {qid}"
            )
        if len(little) != 1:
            raise ValueError(
                f"span_containing_topk takes exactly one little term, got "
                f"{little_text!r} for query {qid}"
            )
        if w <= 0:
            raise ValueError(f"window must be >= 1, got {w} for query {qid}")
        tokenized.append((qid, big, little[0], int(w)))

    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list[str], int]] = []
    for qid, big, little, w in tokenized:
        docs_b, scores_b = searcher.conjunctive_matches_for_text(
            " ".join(big)
        )
        docs_l, scores_l = searcher.conjunctive_matches_for_text(little)
        docs = np.intersect1d(docs_b, docs_l)
        cand[qid] = docs
        if score_from == "big":
            smap = dict(zip(docs_b.tolist(), scores_b.tolist()))
        else:
            smap = dict(zip(docs_l.tolist(), scores_l.tolist()))
        cand_scores[qid] = smap
        if docs.size:
            needs_verify.append((qid, big + [little], w))

    verified: dict[int, np.ndarray] = {}
    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(
            index_dir, cand, needs_verify, "containing", cfg
        )
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _, _ in needs_verify})
        hits = docs_ds.map_batches(
            _SpanContainingVerifier,
            fn_constructor_args=(cand_ref, needs_verify),
            batch_format="pyarrow",
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        ).to_pandas()
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out_rows = []
    for qid, _big, _little, _w in tokenized:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out_rows.append((qid, r, d, s))
    df = pd.DataFrame(
        out_rows, columns=["query_id", "rank", "doc_id", "score"]
    )
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df


def span_within_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str, str, int]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """SpanWithin (Lucene SpanWithinQuery): the identical doc-level
    match set as span_containing_topk — little occurrences inside an
    ordered big window — ranked by the LITTLE term's BM25 score
    (within scores the little spans)."""
    return span_containing_topk(
        index_dir, docs_ds, queries, cfg, positions, score_from="little"
    )
