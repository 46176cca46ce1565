"""Multi-phrase search: Lucene ``MultiPhraseQuery`` (ES
``match_phrase`` over a synonym-expanded token stream) — a phrase in
which each SLOT accepts any of several alternative terms:

    slots = [["big"], ["data", "dataset"]]  ->  "big data" OR "big dataset"

A document matches when some start position p has, for every slot i, a
token at p + i belonging to slot i's alternative set — the contiguous
phrase walk with per-slot term UNIONS.

Plan (phrase.py's two stages, slot-generalized — reference analogy
unchanged: the per-cluster payload gather of index_ivfpq.cpp:111-117):

1. **Candidates, index-local**: per slot, the UNION of the slot terms'
   postings; candidates = the conjunctive intersection ACROSS slots (a
   doc can only match if every slot has >= 1 alternative present).
   A slot with no indexed alternative empties the query.
2. **Positional verify**: ``positions="index"`` reads the positions
   store only (mode ``"multi_phrase"`` in _IndexPosVerifier: per slot
   the union of the doc's alternative position lists, then the plain
   phrase positional intersection — the phrase_prefix final-slot trick
   applied to EVERY slot); ``"corpus"`` re-tokenizes candidates and
   walks token windows against the slot sets.  Both exact, pinned
   identical.

Scoring, pinned + documented divergence: ranked by the DISJUNCTIVE
BM25 sum over the union of all slots' DISTINCT terms (a term listed in
two slots contributes once), restricted to verified docs, ties
(score desc, doc asc).  Lucene's MultiPhraseQuery scores the phrase
freq against a union-idf blend that depends on which alternative
matched at each hit; summing the present alternatives' full BM25
contributions keeps ranking deterministic and SQL-replayable (the
phrase_prefix weight-to-zero argument, one step up: alternatives the
user explicitly listed DO score).

Single-slot degenerate: slots == [[t1, t2, ...]] is a plain
disjunction (every occurrence is a 1-phrase); single-alternative
slots degenerate to the exact phrase — both pytest-pinned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize, tokenize_batch
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact


def normalize_slots(slots: list[list[str]]) -> list[list[str]]:
    """Tokenize + dedup each slot's alternatives; every alternative
    must tokenize to exactly ONE term (a multi-token alternative is a
    nested phrase, not a slot member — Lucene's contract)."""
    if not slots:
        raise ValueError("multi-phrase needs >= 1 slot")
    out = []
    for s, alts in enumerate(slots):
        if not alts:
            raise ValueError(f"slot {s} has no alternatives")
        norm = []
        for a in alts:
            toks = tokenize(a)
            if len(toks) != 1:
                raise ValueError(
                    f"slot {s} alternative {a!r} tokenizes to "
                    f"{len(toks)} terms; each alternative must be one term"
                )
            norm.append(toks[0])
        out.append(sorted(set(norm)))
    return out


def contains_multi_phrase(tokens: list[str], slots: list[list[str]]) -> bool:
    """Token-stream check: some window tokens[s : s+k] has
    tokens[s+i] in slots[i] for every i — the corpus-verify kernel."""
    k = len(slots)
    n = len(tokens)
    if k == 0 or n < k:
        return False
    sets = [set(s) for s in slots]
    for s in range(n - k + 1):
        if all(tokens[s + i] in sets[i] for i in range(k)):
            return True
    return False


class _MultiPhraseVerifier:
    """Corpus verify stage: batch -> (query_id, doc_id) rows for docs
    whose token stream contains the multi-phrase (phrase.py's
    _PhraseVerifier with the slot-set window test)."""

    def __init__(self, cand_ref, items: list[tuple[int, list, list]]):
        import ray

        self.cand = ray.get(cand_ref)  # {qid: sorted uint64 ids}
        self.items = items  # (qid, flat_terms, slots)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        any_mask = np.zeros(len(doc_ids), dtype=bool)
        per_q = {}
        for qid, _, _ in self.items:
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
            for qid, _, slots in self.items:
                m = per_q.get(qid)
                if m is None:
                    continue
                for i in np.flatnonzero(m).tolist():
                    if contains_multi_phrase(row_tokens[i], slots):
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


def _slot_candidates_and_scores(
    searcher: BM25Searcher, slots: list[list[str]], cfg: PipelineConfig
) -> tuple[np.ndarray, dict[int, float]]:
    """(candidate doc ids sorted, disjunctive union-term score map).
    Candidates = intersection over slots of the union of slot-term
    postings; scores = BM25 sum over the DISTINCT union terms present
    (a term in two slots contributes once)."""
    union_terms = sorted({t for s in slots for t in s})
    wanted = {
        t: searcher.stats.term_locations(t, searcher.cfg)
        for t in union_terms
        if searcher.stats.df.get(t, 0) > 0
    }
    fetched = searcher.reader.fetch_terms(wanted)
    postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in sorted(wanted):
        b = fetched.get(t)
        if b is None or not b.n_blocks:
            continue
        b.set_scoring(
            bm25.idf(searcher.stats.df[b.term], searcher.stats.n_docs),
            searcher.stats.avgdl,
            cfg.k1,
            cfg.b,
        )
        postings[t] = b.all_postings()
    empty = np.empty(0, dtype=np.uint64)
    cand: np.ndarray | None = None
    for slot in slots:
        parts = [postings[t][0] for t in slot if t in postings]
        if not parts:
            return empty, {}
        slot_docs = (
            parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
        )
        cand = slot_docs if cand is None else np.intersect1d(
            cand, slot_docs, assume_unique=True
        )
        if not cand.size:
            return empty, {}
    assert cand is not None
    dc = np.concatenate([postings[t][0] for t in postings])
    cc = np.concatenate([postings[t][1] for t in postings])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, cc)
    keep = np.isin(uniq, cand, assume_unique=True)
    return cand, dict(zip(uniq[keep].tolist(), scores[keep].tolist()))


def multi_phrase_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, list[list[str]]]],
    cfg: PipelineConfig | None = None,
    positions: str = "auto",
) -> pd.DataFrame:
    """Top-k multi-phrase search: (query_id, rank, doc_id, score) for
    docs containing the slot phrase (each slot any of its
    alternatives), ranked by the disjunctive BM25 over the union of
    slot terms (score desc, doc_id asc).

    ``positions``: "index" verifies from the positions store only
    (``docs_ds`` may be None), "corpus" re-tokenizes candidates,
    "auto" prefers a fresh store.  Backends pinned identical."""
    import ray

    from mini_ivf_ray.pipelines.phrase import _resolve_positions_mode

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)

    norm = [(qid, normalize_slots(slots)) for qid, slots in queries]
    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    needs_verify: list[tuple[int, list, list]] = []
    verified: dict[int, np.ndarray] = {}
    for qid, slots in norm:
        docs, smap = _slot_candidates_and_scores(searcher, slots, cfg)
        cand[qid] = docs
        cand_scores[qid] = smap
        if len(slots) == 1:
            # 1-slot multi-phrase == plain disjunction: no positions
            verified[qid] = docs
        elif docs.size:
            flat = sorted({t for s in slots for t in s})
            needs_verify.append((qid, flat, slots))

    if needs_verify and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(
            index_dir, cand, needs_verify, "multi_phrase", cfg
        )
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif needs_verify:
        cand_ref = ray.put({q: cand[q] for q, _, _ in needs_verify})
        hits = docs_ds.map_batches(
            _MultiPhraseVerifier,
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
    for qid, _ in norm:
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
