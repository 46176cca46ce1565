"""Query engine: block-max WAND top-k + the exact BM25 oracles.

Reference analogs:
* ``QueryBaseline`` (index_ivfpq.cpp:351-410): rank centroids, scan the
  W nearest posting lists, ADist-score every member, partial_sort top-k.
  Ours: the query's terms NAME their posting lists (no geometric
  ranking); block-max WAND scans them document-at-a-time with a
  fixed-size min-heap and per-block upper-bound skipping.
* ``toolkits/get_groundtruth.cpp``: the oracle is the same engine run
  exhaustively (ncentroids=1).  Ours: ``brute_force_topk`` (local) and
  ``exhaustive_topk`` (distributed map_batches) score every document.

Rank-identity contract: all three scorers follow functions/bm25.py's
canonical accumulation (float64, distinct query terms in lexicographic
order) and the tie-break (score desc, doc_id asc), so their top-k agree
bit-for-bit.  WAND prunes only on STRICT upper-bound inequality, so
score-ties at the heap threshold are never wrongly skipped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import term_freqs, tokenize
from mini_ivf_ray.sources.segments import PostingBlocks, SegmentReader
from mini_ivf_ray.state.stats import CorpusStats


class TermIterator:
    """Block-oriented cursor over one term's globally sorted posting
    blocks.  Block-level skips (``shallow_to``) touch only the (first,
    last, max_score) metadata — the analog of IVF's posting_lists_lens
    scan bookkeeping; decode (cached on the shared PostingBlocks) only
    happens for evaluated blocks."""

    __slots__ = ("term", "blocks", "idf", "global_ub", "bi", "pos", "cur_doc", "exhausted")

    def __init__(self, blocks: PostingBlocks, idf: float, avgdl: float, cfg):
        self.term = blocks.term
        self.blocks = blocks
        self.idf = idf
        # scoring FIRST: raw-mode blocks (multi-epoch partitions)
        # compute their exact max_scores inside set_scoring
        blocks.set_scoring(idf, avgdl, cfg.k1, cfg.b)
        self.global_ub = float(blocks.max_scores.max()) if blocks.n_blocks else 0.0
        self.bi = 0
        self.pos = 0  # index within current block (valid postings start here)
        self.exhausted = blocks.n_blocks == 0
        self.cur_doc = int(blocks.firsts[0]) if not self.exhausted else -1

    @property
    def block_last(self) -> int:
        return int(self.blocks.lasts[self.bi])

    @property
    def block_ub(self) -> float:
        return float(self.blocks.max_scores[self.bi])

    def shallow_to(self, target: int) -> None:
        """Metadata-only: move the block cursor until block_last >= target."""
        b = self.blocks
        moved = False
        while self.bi < b.n_blocks and int(b.lasts[self.bi]) < target:
            self.bi += 1
            moved = True
        if self.bi >= b.n_blocks:
            self.exhausted = True
            return
        if moved:
            self.pos = 0
            self.cur_doc = int(b.firsts[self.bi])

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target (never
        moves backward)."""
        if self.exhausted or self.cur_doc >= target:
            return
        self.shallow_to(target)
        if self.exhausted:
            return
        first = int(self.blocks.firsts[self.bi])
        if first >= target and self.pos == 0:
            self.cur_doc = first
            return
        docs, _ = self.blocks.decoded(self.bi)
        pos = int(np.searchsorted(docs, np.uint64(target), side="left"))
        if pos <= self.pos:
            return
        if pos >= len(docs):  # can't happen (block_last >= target) but guard
            self.bi += 1
            self.pos = 0
            if self.bi >= self.blocks.n_blocks:
                self.exhausted = True
            else:
                self.cur_doc = int(self.blocks.firsts[self.bi])
            return
        self.pos = pos
        self.cur_doc = int(docs[pos])

    def slice_upto(self, hi: int) -> tuple[np.ndarray, np.ndarray]:
        """(docs, contribs) of current block from the cursor position up
        to doc_id <= hi (inclusive)."""
        docs, contribs = self.blocks.decoded(self.bi)
        i1 = int(np.searchsorted(docs, np.uint64(hi), side="right"))
        return docs[self.pos : i1], contribs[self.pos : i1]


def _drain_single(
    it: TermIterator, top_docs: np.ndarray, top_scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Exhaust the last active iterator: every remaining doc scores
    exactly its own contribution, so block-max pruning (strict <) and
    evaluation are both single vectorized passes.  Returns the number of
    postings actually evaluated (skipped blocks don't count)."""
    b = it.blocks
    scored = 0
    # finish the partially-consumed current block first
    if not it.exhausted:
        if b.payloads is not None and b.n_blocks - it.bi > 8:
            b.decode_all()  # one vectorized decode beats per-block passes
        docs, contribs = b.decoded(it.bi)
        d0, c0 = docs[it.pos :], contribs[it.pos :]
        scored += d0.size
        theta = top_scores[-1] if len(top_docs) >= k else -np.inf
        m = c0 >= theta  # per-posting exact filter (ties kept)
        if m.any():
            top_docs, top_scores = _merge_topk(top_docs, top_scores, d0[m], c0[m], k)
        start = it.bi + 1
        for bi in range(start, b.n_blocks):
            theta = top_scores[-1] if len(top_docs) >= k else -np.inf
            if float(b.max_scores[bi]) < theta:
                continue
            docs, contribs = b.decoded(bi)
            scored += docs.size
            m = contribs >= theta
            if m.any():
                top_docs, top_scores = _merge_topk(
                    top_docs, top_scores, docs[m], contribs[m], k
                )
        it.exhausted = True
    return top_docs, top_scores, scored


def _merge_topk(
    top_docs: np.ndarray, top_scores: np.ndarray,
    docs: np.ndarray, scores: np.ndarray, k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge candidates into the running top-k, ranked (score desc,
    doc_id asc).  Exact: lexsort on (-score float64, doc)."""
    all_docs = np.concatenate([top_docs, docs])
    all_scores = np.concatenate([top_scores, scores])
    order = np.lexsort((all_docs, -all_scores))[:k]
    return all_docs[order], all_scores[order]


def _topk_exact(
    docs: np.ndarray, scores: np.ndarray, k: int
) -> list[tuple[int, float]]:
    """Exact (score desc, doc_id asc) top-k without a full sort:
    O(n) partition for the k-th score, then lexsort only the candidates
    (ties at the threshold are kept, so the ranking is identical to a
    full sort — the full lexsort was the TAAT hot spot)."""
    n = len(docs)
    if n > k:
        thr = np.partition(scores, n - k)[n - k]
        m = scores >= thr
        docs, scores = docs[m], scores[m]
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def accumulate_topk(
    per_term: list[tuple[np.ndarray, np.ndarray]], topk: int
) -> list[tuple[int, float]]:
    """Sum per-term (sorted doc_ids, float64 contributions) pairs into
    per-doc scores and return the exact (score desc, doc asc) top-k.
    Accumulation is one ``np.add.at`` over pairs concatenated in the
    caller's (deterministic) term order — the shared tail of the
    boost / synonym / LM-similarity searchers."""
    if not per_term:
        return []
    docs_cat = np.concatenate([d for d, _ in per_term])
    con_cat = np.concatenate([c for _, c in per_term])
    uniq, inv = np.unique(docs_cat, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, con_cat)
    return _topk_exact(uniq, scores, topk)


def taat_topk(
    blocks_list: list[PostingBlocks], k: int, counters: dict | None = None
) -> list[tuple[int, float]]:
    """Exact term-at-a-time evaluation: decode every posting of every
    query term (vectorized, cached on the shared PostingBlocks), then
    the canonical accumulation — one ``scores[idx] += contrib`` per term
    in lexicographic term order, exactly the oracles' float64 pattern —
    and one lexsort top-k.  Bit-identical to WAND/brute-force.

    A rank-safe MaxScore split (``_maxscore_accumulate``) is tried
    first: head+tail query mixes then evaluate only the rare terms'
    postings plus candidate-set gathers into the head lists, instead of
    scoring every posting of every term — the classic TAAT quit/continue
    optimization, vectorized.  When no split exists (all-head or
    all-tail queries) full TAAT runs unchanged.

    This is the DAAT/TAAT cost-model switch the classic engines make:
    WAND's per-round Python bookkeeping costs more than scoring every
    posting until lists get long; below ``cfg.taat_threshold`` total
    postings this path is ~10x faster, above it WAND's block skipping
    wins.  (Reference analog: QueryBaseline scans the selected posting
    lists member-at-a-time with no pruning, index_ivfpq.cpp:351-410 —
    TAAT is that scan, vectorized.)"""
    # one sort via np.unique(return_inverse=True) inside
    # _taat_accumulate: the inverse IS the per-posting slot map, so the
    # per-term searchsorted passes disappear (~15% off the TAAT wall; a
    # hash-based factorize map was tried and measured SLOWER than the
    # sort on u64 doc ids).  Accumulation stays one vectorized += per
    # term in lexicographic term order — scores bit-identical.
    ms = _maxscore_accumulate(blocks_list, k)
    if ms is not None:
        uniq, scores, scored = ms
        path_key = "maxscore_queries"
    else:
        uniq, scores, scored = _taat_accumulate(blocks_list)
        path_key = "taat_queries"
    out = _topk_exact(uniq, scores, k) if uniq.size else []
    if counters is not None:
        counters["searched_cnt"] = counters.get("searched_cnt", 0) + scored
        counters[path_key] = counters.get(path_key, 0) + 1
        counters["n_queries"] = counters.get("n_queries", 0) + 1
    return out


def _maxscore_accumulate(
    blocks_list: list[PostingBlocks],
    k: int,
    allowed: np.ndarray | None = None,
    denied: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Rank-safe MaxScore evaluation (Turtle & Flood 1995, "Query
    evaluation: strategies and optimizations"), vectorized.

    Terms are ordered by descending global score upper bound (the max
    over their per-block WAND maxima — valid upper bounds in every
    storage mode).  The ESSENTIAL set is the smallest prefix whose
    complement's summed upper bounds fall STRICTLY below a lower bound
    on the final k-th score; ``theta_lb`` is the k-th best single-term
    contribution of the top-ranked term, which k real documents'
    full scores dominate, so the true final threshold can only be
    higher.  A document matching only non-essential terms scores at
    most that complement sum < theta_lb <= theta — strictly below the
    k-th candidate, so it can neither enter the top-k nor tie at the
    boundary.  Candidates are therefore exactly the union of the
    essential terms' postings; each non-essential (head) term
    contributes via ONE ``searchsorted`` gather of the candidate ids
    into its posting array instead of a full-list accumulation —
    O(|candidates| log df) probes replace df evaluations.

    Bit-identity: candidate scores accumulate one vectorized ``+=`` per
    term in lexicographic term order — the same float64 addition
    sequence per document as full TAAT / WAND / the oracles, so
    surviving scores are bit-identical, and ``_topk_exact``'s
    (score desc, doc_id asc) selection is unchanged.

    Filtered retrieval (``allowed`` / ``denied`` sorted uint64 doc-id
    sets, filtered_topk semantics): theta_lb is then the k-th best
    top-term contribution among SURVIVING docs only — those k survivors'
    full scores dominate the final (filtered) threshold, so a surviving
    doc matching only non-essential terms is still strictly excluded.
    Candidates stay the unfiltered essential union; the caller applies
    the survival mask before the top-k cut exactly as in full TAAT.

    Returns (candidate docs asc, full scores, postings evaluated), or
    None when no split exists (single term, all terms essential, top
    term shorter than k, or bounds not yet computed) — callers then run
    full TAAT, which is optimal for those shapes.
    """
    bl = sorted((b for b in blocks_list if b.n_blocks), key=lambda b: b.term)
    m = len(bl)
    if m < 2:
        return None
    if any(b.max_scores is None for b in bl):
        return None  # raw-mode blocks before set_scoring: bounds unknown
    ubs = np.array([float(b.max_scores.max()) for b in bl], dtype=np.float64)
    order = np.argsort(-ubs, kind="stable")
    d1, c1 = bl[int(order[0])].all_postings()
    if allowed is not None or (denied is not None and denied.size):
        live = (
            _allowed_mask(d1, allowed)
            if allowed is not None
            else np.ones(d1.size, dtype=bool)
        )
        if denied is not None and denied.size:
            live &= ~_allowed_mask(d1, denied)
        c1 = c1[live]
    if c1.size < k:
        return None  # top term can't witness k candidates: no valid bound
    theta_lb = float(np.partition(c1, c1.size - k)[c1.size - k])
    # tails[i] = sum of the i-th..last upper bounds in descending order
    tails = np.concatenate([np.cumsum(ubs[order][::-1])[::-1], [0.0]])
    e = next((i for i in range(1, m) if tails[i] < theta_lb), m)
    if e >= m:
        return None  # every term is essential: plain TAAT is optimal
    essential = {int(i) for i in order[:e]}
    e_docs = [bl[i].all_postings()[0] for i in sorted(essential)]
    uniq = e_docs[0] if len(e_docs) == 1 else np.unique(np.concatenate(e_docs))
    scores = np.zeros(uniq.size, dtype=np.float64)
    scored = 0
    for i, b in enumerate(bl):  # lexicographic term order (canonical)
        d, c = b.all_postings()
        if i in essential:
            scores[np.searchsorted(uniq, d)] += c
            scored += int(d.size)
        else:
            idx = np.searchsorted(d, uniq)
            np.minimum(idx, d.size - 1, out=idx)
            hit = d[idx] == uniq
            if hit.any():
                scores[hit] += c[idx[hit]]
                scored += int(hit.sum())
    return uniq, scores, scored


def _taat_accumulate(
    blocks_list: list[PostingBlocks],
) -> tuple[np.ndarray, np.ndarray, int]:
    """The TAAT union evaluation shared by taat_topk and filtered_topk:
    (unique docs asc, full scores, postings decoded), accumulation one
    vectorized += per term in lexicographic term order (the oracles'
    exact float64 pattern)."""
    blocks_list = sorted((b for b in blocks_list if b.n_blocks), key=lambda b: b.term)
    if not blocks_list:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64), 0
    if len(blocks_list) == 1:
        d, c = blocks_list[0].all_postings()
        return d, c, d.size
    parts = [b.all_postings() for b in blocks_list]
    scored = sum(d.size for d, _ in parts)
    uniq, inv = np.unique(
        np.concatenate([d for d, _ in parts]), return_inverse=True
    )
    scores = np.zeros(len(uniq), dtype=np.float64)
    off = 0
    for d, c in parts:
        scores[inv[off : off + d.size]] += c
        off += d.size
    return uniq, scores, scored


def _allowed_mask(docs: np.ndarray, allowed: np.ndarray) -> np.ndarray:
    """Membership of ``docs`` in the sorted ``allowed`` id array."""
    if allowed.size == 0 or docs.size == 0:
        return np.zeros(docs.size, dtype=bool)
    idx = np.searchsorted(allowed, docs)
    idx[idx >= allowed.size] = allowed.size - 1
    return allowed[idx] == docs


def filtered_topk(
    blocks_list: list[PostingBlocks],
    k: int,
    allowed: np.ndarray | None,
    n_query_terms: int = 0,
    mode: str = "or",
    counters: dict | None = None,
    denied: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact metadata-FILTERED retrieval: rank only documents in the
    (sorted uint64) ``allowed`` id set and NOT in the (sorted uint64)
    ``denied`` set.  Classic filtered-search semantics — corpus-wide
    statistics, restricted result set — so a surviving doc scores
    bit-identically to its unfiltered counterpart.  ``denied`` is the
    live-docs tombstone mask (Lucene deleted-docs semantics: statistics
    keep counting deleted documents until a compaction rewrites the
    segments).  The filter is applied to the full match set BEFORE the
    top-k cut (a post-filtered top-k would silently under-fill)."""
    ms = None
    if mode == "and":
        docs, scores, scored = conjunctive_matches(blocks_list, n_query_terms)
    else:
        ms = _maxscore_accumulate(blocks_list, k, allowed=allowed, denied=denied)
        if ms is not None:
            docs, scores, scored = ms
        else:
            docs, scores, scored = _taat_accumulate(blocks_list)
    if allowed is not None:
        keep = _allowed_mask(docs, allowed)
    else:
        keep = np.ones(docs.size, dtype=bool)
    if denied is not None and denied.size:
        keep &= ~_allowed_mask(docs, denied)
    out = _topk_exact(docs[keep], scores[keep], k) if keep.any() else []
    if counters is not None:
        counters["searched_cnt"] = counters.get("searched_cnt", 0) + scored
        counters["filtered_queries"] = counters.get("filtered_queries", 0) + 1
        if ms is not None:
            counters["maxscore_queries"] = counters.get("maxscore_queries", 0) + 1
        counters["n_queries"] = counters.get("n_queries", 0) + 1
    return out


def conjunctive_topk(
    blocks_list: list[PostingBlocks],
    k: int,
    n_query_terms: int,
    counters: dict | None = None,
) -> list[tuple[int, float]]:
    """Exact conjunctive (AND) evaluation: only documents containing
    EVERY query term are ranked; scores are the same BM25 sums as the
    disjunctive paths, so a conjunctive hit scores identically to its
    disjunctive counterpart (all terms contribute).

    Shape: posting lists are globally doc-sorted (disjoint increasing
    block/salt ranges), so the candidate set is a sorted-array
    intersection (smallest list first — the classic conjunctive-DAAT
    cost order) and each term's contribution is gathered with one
    ``searchsorted`` + fancy-index per term.  Accumulation stays one
    vectorized ``+=`` per term in lexicographic term order — the exact
    float64 pattern TAAT/WAND/the oracles use, so scores are
    bit-identical.  A query with an absent (OOV or zero-posting) term
    matches nothing, by definition of AND."""
    docs, scores, scored = conjunctive_matches(blocks_list, n_query_terms)
    out = _topk_exact(docs, scores, k) if docs.size else []
    if counters is not None:
        counters["searched_cnt"] = counters.get("searched_cnt", 0) + scored
        counters["and_queries"] = counters.get("and_queries", 0) + 1
        counters["n_queries"] = counters.get("n_queries", 0) + 1
    return out


def conjunctive_matches(
    blocks_list: list[PostingBlocks], n_query_terms: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """The full conjunctive match set: (docs asc, scores, postings
    decoded).  Shared by conjunctive top-k and phrase candidate
    generation (which must rank AFTER a verify filter, so it needs
    every match, not just the top k)."""
    blocks_list = sorted(
        (b for b in blocks_list if b.n_blocks), key=lambda b: b.term
    )
    empty = (
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.float64),
        0,
    )
    if not blocks_list or len(blocks_list) != n_query_terms:
        return empty
    parts = [b.all_postings() for b in blocks_list]
    by_size = sorted((d for d, _ in parts), key=lambda d: d.size)
    # membership gather against the smallest list: O(|cand| log df) per
    # term instead of intersect1d's sort of the concatenation — the
    # classic conjunctive-DAAT cost order, vectorized (lists are sorted
    # unique doc arrays, so the gather IS the exact intersection)
    docs = by_size[0]
    for d in by_size[1:]:
        if docs.size == 0:
            break
        idx = np.searchsorted(d, docs)
        np.minimum(idx, d.size - 1, out=idx)
        docs = docs[d[idx] == docs]
    scored = sum(d.size for d, _ in parts)
    if not docs.size:
        return empty[0], empty[1], scored
    scores = np.zeros(docs.size, dtype=np.float64)
    for d, c in parts:  # lexicographic term order
        scores += c[np.searchsorted(d, docs)]
    return docs, scores, scored


def topk_from_blocks(
    fetched: dict[str, PostingBlocks | None],
    stats: CorpusStats,
    cfg: PipelineConfig,
    counters: dict | None = None,
    mode: str = "or",
    allowed: np.ndarray | None = None,
    denied: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
) -> list[tuple[int, float]]:
    """Hybrid evaluation entry: TAAT below the posting-count threshold,
    block-max WAND above it.  Both are exact and bit-identical.
    ``mode="and"`` routes to conjunctive evaluation instead (every
    fetched term must match; callers must ensure ``fetched`` covers ALL
    query terms, including unresolved ones as ``None``).  ``allowed`` /
    ``denied`` (sorted uint64 doc ids) restrict the result set exactly
    (filtered_topk; ``denied`` is the tombstone live-docs mask).

    ``after=(score, doc_id)`` is the keyset-pagination cursor
    (Elasticsearch ``search_after`` semantics): return the top-k of the
    docs strictly AFTER the cursor in (score desc, doc_id asc) order.
    Cursor queries evaluate through the FULL accumulation (TAAT, or the
    conjunctive intersection for ``mode="and"``) — top-k-bound pruning
    (MaxScore/WAND) is rank-unsafe at arbitrary cursor depth, and
    consecutive same-query pages are deterministic float64 sums, so
    page boundaries are exact (score equality at the cursor is
    well-defined, not fragile).  Cursors compose with ``mode="and"``,
    ``allowed`` and ``denied``: the masks restrict the match set BEFORE
    the cursor cut (same pre-top-k semantics as filtered_topk), so a
    filtered page 2 continues the filtered page 1's ranking exactly."""
    blocks_list = [b for b in fetched.values() if b is not None]
    total = sum(b.n_postings for b in blocks_list)
    for b in blocks_list:
        b.set_scoring(
            bm25.idf(stats.df[b.term], stats.n_docs), stats.avgdl, cfg.k1, cfg.b
        )
    if after is not None:
        s_aft = np.float64(after[0])
        d_aft = np.uint64(after[1])
        if mode == "and":
            uniq, scores, scored = conjunctive_matches(
                blocks_list, len(fetched)
            )
        else:
            uniq, scores, scored = _taat_accumulate(blocks_list)
        if allowed is not None:
            keep = _allowed_mask(uniq, allowed)
            uniq, scores = uniq[keep], scores[keep]
        if denied is not None and denied.size:
            keep = ~_allowed_mask(uniq, denied)
            uniq, scores = uniq[keep], scores[keep]
        m = (scores < s_aft) | ((scores == s_aft) & (uniq > d_aft))
        uniq, scores = uniq[m], scores[m]
        out = _topk_exact(uniq, scores, cfg.topk) if uniq.size else []
        if counters is not None:
            counters["searched_cnt"] = counters.get("searched_cnt", 0) + scored
            counters["after_queries"] = counters.get("after_queries", 0) + 1
            counters["n_queries"] = counters.get("n_queries", 0) + 1
        return out
    if allowed is not None or (denied is not None and denied.size):
        return filtered_topk(
            blocks_list,
            cfg.topk,
            allowed,
            n_query_terms=len(fetched),
            mode=mode,
            counters=counters,
            denied=denied,
        )
    if mode == "and":
        return conjunctive_topk(
            blocks_list, cfg.topk, len(fetched), counters=counters
        )
    if total <= cfg.taat_threshold:
        return taat_topk(blocks_list, cfg.topk, counters=counters)
    if cfg.taat_threshold > 0:
        # above the TAAT threshold a MaxScore split still beats WAND's
        # per-round bookkeeping whenever one exists (head-heavy queries
        # on large corpora); taat_threshold=0 stays the documented
        # force-WAND debug switch, so the attempt is skipped there
        ms = _maxscore_accumulate(blocks_list, cfg.topk)
        if ms is not None:
            uniq, scores, scored = ms
            out = _topk_exact(uniq, scores, cfg.topk) if uniq.size else []
            if counters is not None:
                counters["searched_cnt"] = counters.get("searched_cnt", 0) + scored
                counters["maxscore_queries"] = (
                    counters.get("maxscore_queries", 0) + 1
                )
                counters["n_queries"] = counters.get("n_queries", 0) + 1
            return out
    iters = [
        TermIterator(
            b, bm25.idf(stats.df[b.term], stats.n_docs), stats.avgdl, cfg
        )
        for b in sorted(blocks_list, key=lambda x: x.term)
    ]
    return wand_topk(iters, cfg.topk, counters=counters)


def wand_topk(
    iters: list[TermIterator], k: int, counters: dict | None = None
) -> list[tuple[int, float]]:
    """Block-max WAND, block-vectorized.  Returns [(doc_id, score)]
    ranked by (score desc, doc_id asc), only docs with >=1 query term.

    Each round either (a) proves via summed CURRENT block maxima that no
    doc up to the nearest block boundary can beat the running threshold
    and skips there (STRICT inequality, so score-ties at the threshold
    are never wrongly pruned), or (b) evaluates the whole qualifying
    doc_id range at once: per-term slices scattered into a unique-doc
    score array with one vectorized += per term in lexicographic term
    order — the exact float64 accumulation pattern the oracles use.
    """
    top_docs = np.empty(0, dtype=np.uint64)
    top_scores = np.empty(0, dtype=np.float64)
    scored = 0  # postings evaluated (reference: searched_cnt,
    #             test_ivf_sift1m_baseline.cpp:59-68 / A3-A4)
    rounds = 0
    active = [it for it in iters if not it.exhausted]
    while True:
        active = [it for it in active if not it.exhausted]
        if not active:
            break
        if len(active) == 1:
            # sole remaining term: its docs' scores are single
            # contributions — block-max filter the remaining blocks in
            # one vectorized pass and merge once (no per-block rounds)
            top_docs, top_scores, n = _drain_single(
                active[0], top_docs, top_scores, k
            )
            scored += n
            break
        rounds += 1
        active.sort(key=lambda it: it.cur_doc)
        full = len(top_docs) >= k
        theta = top_scores[-1] if full else float("-inf")

        # --- pivot: first prefix whose summed global UBs could enter ---
        acc = 0.0
        pivot = -1
        for i, it in enumerate(active):
            acc += it.global_ub
            if not full or acc >= theta:
                pivot = i
                break
        if pivot < 0:
            break  # even all terms together cannot reach theta
        pivot_doc = active[pivot].cur_doc
        # extend over cur_doc ties (bound soundness + strict progress)
        while pivot + 1 < len(active) and active[pivot + 1].cur_doc == pivot_doc:
            pivot += 1

        if active[0].cur_doc < pivot_doc:
            # prefix sum up to pivot-1 is < theta strictly: docs below
            # pivot_doc (only coverable by that prefix) cannot enter
            for it in active[:pivot]:
                if it.cur_doc < pivot_doc:
                    it.next_geq(pivot_doc)
            continue

        # all of active[:pivot+1] sit at pivot_doc
        sub = active[: pivot + 1]
        for it in sub:
            it.shallow_to(pivot_doc)
        sub = [it for it in sub if not it.exhausted]
        if not sub:
            continue
        L = min(it.block_last for it in sub)
        # expand the evaluation set over every iterator whose cursor
        # falls inside [pivot_doc, L] instead of clipping L down to it —
        # ranges stay block-sized instead of fragmenting at each
        # other term's cursor (rounds ~ blocks, not cursor interleavings)
        j = pivot + 1
        while j < len(active) and active[j].cur_doc <= L:
            it = active[j]
            sub.append(it)
            L = min(L, it.block_last)
            j += 1
        bub = sum(it.block_ub for it in sub)
        if full and bub < theta:
            for it in sub:
                it.next_geq(L + 1)
            continue

        # --- vectorized evaluation of [pivot_doc, L] ---
        sub.sort(key=lambda it: it.term)  # canonical term order
        parts_d, parts_c = [], []
        for it in sub:
            d, c = it.slice_upto(L)
            if d.size:
                parts_d.append(d)
                parts_c.append(c)
                scored += d.size
            it.next_geq(L + 1)
        if not parts_d:
            continue
        if len(parts_d) == 1:
            uniq, scores = parts_d[0], parts_c[0]
        else:
            # exact canonical accumulation: one vectorized += per term,
            # in sorted-term order — the oracles' scores[idx] += contrib
            # pattern verbatim (NOT reduceat, whose SIMD summation order
            # differs by an ulp on small segments)
            uniq = np.unique(np.concatenate(parts_d))
            scores = np.zeros(len(uniq), dtype=np.float64)
            for d, c in zip(parts_d, parts_c):
                scores[np.searchsorted(uniq, d)] += c
        top_docs, top_scores = _merge_topk(top_docs, top_scores, uniq, scores, k)
    if counters is not None:
        counters["searched_cnt"] = counters.get("searched_cnt", 0) + scored
        counters["rounds"] = counters.get("rounds", 0) + rounds
        counters["n_queries"] = counters.get("n_queries", 0) + 1
    return [(int(d), float(s)) for d, s in zip(top_docs, top_scores)]


def share_segments(index_dir: str, num_partitions: int) -> dict:
    """Publish every partition's postings table to the object store ONCE
    (parallel read tasks) and return {pid: ObjectRef}.  Searcher actors
    on the same node then map the Arrow buffers zero-copy instead of
    each re-reading + re-decompressing the files — per-actor segment IO
    was the query-phase scaling ceiling.  On a multi-node cluster this
    is one copy per node (plasma is node-local), the right trade."""
    import ray

    @ray.remote(num_cpus=0.5)
    def _read(p: int):
        # reads EVERY segment file of the partition (base + increments)
        # and returns term-contiguous rows (sources/segments helper)
        from mini_ivf_ray.sources.segments import read_partition_table

        return read_partition_table(index_dir, p)

    refs = {p: _read.remote(p) for p in range(num_partitions)}
    # materialize BEFORE the searcher pool claims the CPUs: actors
    # blocking on ray.get of still-queued read tasks serialize the pool
    ray.wait(list(refs.values()), num_returns=len(refs))
    return refs


class BM25Searcher:
    """Stateful query-serving stage (actor pool; SURVEY T2): corpus
    stats + segment readers loaded once per actor in ``__init__``, then
    ``__call__`` serves query batches.  Deployed via
    ``queries_ds.map_batches(BM25Searcher, concurrency=N, ...)``."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        mode: str = "or",
        allowed_ref=None,
        denied_ref=None,
    ):
        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        self.mode = mode

        # metadata filter / tombstones: sorted uint64 doc-id arrays,
        # ray.put once by search() and shared zero-copy by every actor
        def _resolve(ref):
            if ref is None:
                return None
            import ray

            arr = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            return np.asarray(arr, dtype=np.uint64)

        self.allowed = _resolve(allowed_ref)
        self.denied = _resolve(denied_ref)
        # default the partitioning/scoring config FROM THE INDEX — a
        # mismatched num_partitions/hot_df_threshold would silently
        # resolve terms to the wrong partitions
        self.cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
        self.stats = CorpusStats.load(index_dir)
        if decoded_refs is not None:
            from mini_ivf_ray.sources.decoded import DecodedReader

            self.reader = DecodedReader(decoded_refs)
        else:
            self.reader = SegmentReader(index_dir, shared_tables=shared_tables)
        self.counters: dict = {}  # searched_cnt / rounds / n_queries (A3-A4)

    def topk_for_text(
        self, qtext: str, after: tuple[float, int] | None = None
    ) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0  # OOV -> empty posting list
        }
        if self.mode == "and" and len(wanted) < len(terms):
            # an OOV query term can match no document: AND is empty
            # before any fetch
            if self.counters is not None:
                self.counters["and_queries"] = (
                    self.counters.get("and_queries", 0) + 1
                )
                self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
            return []
        fetched = self.reader.fetch_terms(wanted)
        # QueryObs analog (reference: per-cluster ground-truth hit
        # histogram, index_ivfpq.cpp:412-470): per-PARTITION probe
        # counts — which segments this workload actually touches
        pp = self.counters.setdefault("partition_probes", {})
        for t, locs in wanted.items():
            for p in dict.fromkeys(locs):
                pp[p] = pp.get(p, 0) + 1
        return topk_from_blocks(
            fetched,
            self.stats,
            self.cfg,
            counters=self.counters,
            mode=self.mode,
            allowed=self.allowed,
            denied=self.denied,
            after=after,
        )

    def conjunctive_matches_for_text(
        self, qtext: str
    ) -> tuple[np.ndarray, np.ndarray]:
        """EVERY doc containing all distinct query terms, with its full
        BM25 score — the candidate generator for phrase search (which
        filters before ranking, so top-k here would be wrong)."""
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        if not terms or len(wanted) < len(terms):
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        fetched = self.reader.fetch_terms(wanted)
        blocks_list = [b for b in fetched.values() if b is not None]
        for b in blocks_list:
            b.set_scoring(
                bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
        docs, scores, scored = conjunctive_matches(blocks_list, len(fetched))
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        return docs, scores

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        # optional per-query keyset-pagination cursor columns: a row
        # with non-null (after_score, after_doc) asks for the page
        # strictly after that (score, doc_id) in ranking order
        afters: list[tuple[float, int] | None]
        if "after_score" in batch.column_names:
            a_s = batch["after_score"].to_pylist()
            a_d = batch["after_doc"].to_pylist()
            afters = [
                (float(s), int(d)) if s is not None else None
                for s, d in zip(a_s, a_d)
            ]
        else:
            afters = [None] * len(ids)
        for qid, qtext, after in zip(ids, texts, afters):
            for r, (d, s) in enumerate(self.topk_for_text(qtext, after=after)):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(np.array(docs, dtype=np.uint64), type=pa.uint64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    mode: str = "or",
    allowed_docs=None,
    denied_docs=None,
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> results (query_id, rank, doc_id, score).

    share="decoded" (default): decode the index once into the object
    store and give every actor zero-copy views (per-actor decode
    duplication was the serving scaling ceiling).  share="tables":
    share only the raw Arrow segment tables.  share=False: each actor
    reads from disk (the cold path).

    allowed_docs: optional iterable/array of doc ids — exact filtered
    retrieval (results restricted to the set; corpus-wide statistics,
    so surviving docs score bit-identically to unfiltered search).
    Broadcast once via ray.put, never re-shipped per batch.

    denied_docs: optional doc ids to EXCLUDE (same exact pre-top-k
    semantics).  When respect_deletes is True (default), the index's
    persisted tombstones (pipelines/maintenance.delete_docs) are merged
    in automatically — live-docs masking à la Lucene deleted docs:
    statistics keep counting deleted documents until compact_index
    rewrites the segments.

    Keyset pagination: queries_ds may carry optional per-row
    (after_score, after_doc) cursor columns — a non-null pair asks for
    the top-k strictly AFTER that (score, doc_id) in ranking order
    (search_after semantics; see topk_from_blocks)."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        shared = share_segments(index_dir, cfg.num_partitions)
    allowed_ref = None
    if allowed_docs is not None:
        import ray

        allowed_ref = ray.put(
            np.unique(np.asarray(allowed_docs, dtype=np.uint64))
        )
    denied = None
    if denied_docs is not None:
        denied = np.asarray(denied_docs, dtype=np.uint64)
    if respect_deletes:
        from mini_ivf_ray.pipelines.maintenance import deleted_ids

        tomb = deleted_ids(index_dir)
        if tomb.size:
            denied = tomb if denied is None else np.concatenate([denied, tomb])
    denied_ref = None
    if denied is not None and denied.size:
        import ray

        denied_ref = ray.put(np.unique(denied))
    return queries_ds.map_batches(
        BM25Searcher,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, mode, allowed_ref, denied_ref,
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),  # autoscale to free CPUs
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Oracles (reference: toolkits/get_groundtruth.cpp — same engine, exhaustive)
# ---------------------------------------------------------------------------


def brute_force_topk(
    docs: pd.DataFrame,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    mode: str = "or",
) -> pd.DataFrame:
    """Local exact oracle over a small corpus (columns doc_id, text).
    Canonical accumulation; used by pytest for rank-identity.
    ``mode="and"`` keeps only docs containing every distinct query term
    (conjunctive retrieval); scores are unchanged for surviving docs."""
    cfg = cfg or PipelineConfig()
    doc_ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = doc_ids[order]
    texts = docs["text"].to_numpy()[order]
    tfs_per_doc = [term_freqs(t) for t in texts]
    dls = np.array([sum(c.values()) for c in tfs_per_doc], dtype=np.int64)
    n_docs = len(doc_ids)
    avgdl = dls.sum() / n_docs if n_docs else 0.0

    postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    tmp: dict[str, tuple[list, list]] = {}
    for i, c in enumerate(tfs_per_doc):
        for t, f in c.items():
            slot = tmp.setdefault(t, ([], []))
            slot[0].append(i)
            slot[1].append(f)
    for t, (idx, f) in tmp.items():
        postings[t] = (np.array(idx, dtype=np.int64), np.array(f, dtype=np.int64))

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, qtext in queries:
        qterms = sorted(set(tokenize(qtext)))
        scores = np.zeros(n_docs, dtype=np.float64)
        nmatch = np.zeros(n_docs, dtype=np.int64)
        for t in qterms:
            if t not in postings:
                continue
            idx, f = postings[t]
            scores[idx] += bm25.contributions(
                f, dls[idx], int(len(idx)), n_docs, avgdl, cfg.k1, cfg.b
            )
            nmatch[idx] += 1
        cand = np.flatnonzero(
            nmatch == len(qterms) if mode == "and" else nmatch > 0
        )
        if cand.size == 0:
            continue
        rank_order = np.lexsort((doc_ids[cand], -scores[cand]))[: cfg.topk]
        sel = cand[rank_order]
        for r, i in enumerate(sel):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(int(doc_ids[i]))
            out["score"].append(float(scores[i]))
    df = pd.DataFrame(out)
    df["doc_id"] = df["doc_id"].astype(np.uint64) if len(df) else df.get("doc_id")
    return df


class _ExhaustiveScorer:
    """Distributed exhaustive scorer: each doc batch scored against ALL
    queries (doc-at-a-time), emitting per-batch top-k candidates — the
    map side of the distributed oracle.  Needs the global stats
    (broadcast) so per-doc scores are final, not partial."""

    def __init__(self, stats_ref, queries: list[tuple[int, str]], cfg: PipelineConfig):
        import ray

        self.stats: CorpusStats = (
            ray.get(stats_ref) if not isinstance(stats_ref, CorpusStats) else stats_ref
        )
        self.cfg = cfg
        self.queries = [
            (qid, sorted(set(tokenize(qtext)))) for qid, qtext in queries
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)
        tfs_per_doc = [term_freqs(t) for t in texts]
        dls = np.array([sum(c.values()) for c in tfs_per_doc], dtype=np.int64)
        n = len(texts)
        st, cfg = self.stats, self.cfg

        # per-batch term -> (doc positions, tf)
        tmp: dict[str, tuple[list, list]] = {}
        for i, c in enumerate(tfs_per_doc):
            for t, f in c.items():
                slot = tmp.setdefault(t, ([], []))
                slot[0].append(i)
                slot[1].append(f)

        out = {"query_id": [], "doc_id": [], "score": []}
        for qid, terms in self.queries:
            scores = np.zeros(n, dtype=np.float64)
            touched = np.zeros(n, dtype=bool)
            for t in terms:  # already sorted
                hit = tmp.get(t)
                df = st.df.get(t, 0)
                if hit is None or df <= 0:
                    continue
                idx = np.array(hit[0], dtype=np.int64)
                f = np.array(hit[1], dtype=np.int64)
                scores[idx] += bm25.contributions(
                    f, dls[idx], df, st.n_docs, st.avgdl, cfg.k1, cfg.b
                )
                touched[idx] = True
            cand = np.flatnonzero(touched)
            if cand.size == 0:
                continue
            sel = cand[np.lexsort((doc_ids[cand], -scores[cand]))[: cfg.topk]]
            out["query_id"].extend([qid] * len(sel))
            out["doc_id"].extend(int(doc_ids[i]) for i in sel)
            out["score"].extend(float(scores[i]) for i in sel)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out["doc_id"], dtype=np.uint64), type=pa.uint64()
                ),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )


def exhaustive_topk(
    docs_ds, stats: CorpusStats, queries: list[tuple[int, str]], cfg: PipelineConfig | None = None
) -> pd.DataFrame:
    """Distributed exact oracle: per-batch top-k candidates, merged to a
    global top-k per query on the driver (candidate set is
    O(batches * nq * k) — small).  Same accumulation contract as WAND."""
    import ray

    cfg = cfg or PipelineConfig()
    stats_ref = ray.put(stats)
    cands = docs_ds.map_batches(
        _ExhaustiveScorer,
        fn_constructor_args=(stats_ref, queries, cfg),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=cfg.query_concurrency,
        num_cpus=1,
    ).to_pandas()
    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, g in cands.groupby("query_id", sort=True):
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(cfg.topk)
        out["query_id"].extend([qid] * len(g))
        out["rank"].extend(range(len(g)))
        out["doc_id"].extend(g["doc_id"].tolist())
        out["score"].extend(g["score"].tolist())
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
        df["rank"] = df["rank"].astype(np.int32)
    return df
