"""MaxScore (Turtle & Flood 1995) rank-safety + bit-identity.

The TAAT path tries a rank-safe MaxScore split first
(query.py:_maxscore_accumulate): head terms whose summed upper bounds
can't reach the k-th candidate score are evaluated by candidate-set
gathers instead of full-list accumulation.  These tests pin:

* the split actually triggers on head+tail query mixes (counter);
* results stay BIT-identical to the brute-force oracle and to full
  TAAT accumulation (same docs, same float64 scores, same order);
* searched_cnt drops below the full posting count when it triggers
  (the reference's avg_searched_cnt analog — fewer postings evaluated
  is the point of the optimization, test_ivf_sift1m_baseline.cpp:59-68).
"""

from collections import Counter

import numpy as np

from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _allowed_mask,
    _maxscore_accumulate,
    _taat_accumulate,
    _topk_exact,
    brute_force_topk,
    filtered_topk,
    topk_from_blocks,
)
from mini_ivf_ray.state.stats import CorpusStats


def _vocab_by_df(docs):
    df = Counter()
    for text in docs["text"]:
        df.update(set(tokenize(text)))
    return df


def _mixed_queries(docs, rng, nq=60):
    """head+tail mixes engineered so MaxScore splits are common: one
    rare-but-df>=k term + one or two head terms per query."""
    df = _vocab_by_df(docs)
    heads = [t for t, c in df.most_common(8)]
    mids = [t for t, c in df.items() if 12 <= c <= 60]
    assert len(mids) >= 10, "fixture corpus lost its mid-df tail"
    qs = []
    for qid in range(nq):
        n_head = int(rng.integers(1, 3))
        terms = [mids[int(rng.integers(0, len(mids)))]] + [
            heads[int(rng.integers(0, len(heads)))] for _ in range(n_head)
        ]
        qs.append((qid, " ".join(terms)))
    return qs


def test_maxscore_triggers_and_matches_oracle(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(23)
    queries = _mixed_queries(docs, rng)
    oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    s = BM25Searcher(idx, cfg)
    rows = []
    for qid, qt in queries:
        for r, (d, sc) in enumerate(s.topk_for_text(qt)):
            rows.append((qid, r, d, sc))
    import pandas as pd

    res = (
        pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # the split must actually run on this engineered mix
    assert s.counters.get("maxscore_queries", 0) > 0
    assert len(res) == len(oracle)
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(), oracle["score"].to_numpy()
    )


def test_maxscore_bit_identical_to_full_taat(tiny_index):
    """Per query: the MaxScore candidate scores equal full TAAT's scores
    for the same docs EXACTLY (same float64 accumulation order), and the
    top-k selections coincide."""
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(31)
    queries = _mixed_queries(docs, rng, nq=40)
    s = BM25Searcher(idx, cfg)
    stats = CorpusStats.load(idx)
    n_split = 0
    for qid, qt in queries:
        terms = sorted(set(tokenize(qt)))
        wanted = {
            t: stats.term_locations(t, cfg)
            for t in terms
            if stats.df.get(t, 0) > 0
        }
        fetched = s.reader.fetch_terms(wanted)
        blocks = [b for b in fetched.values() if b is not None]
        for b in blocks:
            b.set_scoring(
                bm25.idf(stats.df[b.term], stats.n_docs),
                stats.avgdl, cfg.k1, cfg.b,
            )
        ms = _maxscore_accumulate(blocks, cfg.topk)
        full_docs, full_scores, full_n = _taat_accumulate(blocks)
        if ms is None:
            continue
        n_split += 1
        cand, cand_scores, n_eval = ms
        # candidates are a subset of the full match set, with EXACTLY
        # equal scores (bit-identical accumulation)
        pos = np.searchsorted(full_docs, cand)
        np.testing.assert_array_equal(full_docs[pos], cand)
        np.testing.assert_array_equal(full_scores[pos], cand_scores)
        # fewer postings evaluated than full TAAT
        assert n_eval < full_n
        # every full-TAAT top-k doc survives into the candidate set
        k = cfg.topk
        order = np.lexsort((full_docs, -full_scores))[:k]
        top_docs = full_docs[order]
        assert np.isin(top_docs, cand).all()
    assert n_split > 0, "no query produced a split — fixture drifted"


def test_maxscore_searched_cnt_drops(tiny_index):
    """On a head+tail query the counter counts evaluated postings only —
    strictly below the query terms' total posting count."""
    idx, cfg, docs = tiny_index
    df = _vocab_by_df(docs)
    heads = [t for t, _ in df.most_common(2)]
    mid = next(t for t, c in sorted(df.items()) if 12 <= c <= 60)
    q = f"{mid} {heads[0]} {heads[1]}"
    s = BM25Searcher(idx, cfg)
    res = s.topk_for_text(q)
    assert len(res) > 0
    total_postings = sum(df[t] for t in set(tokenize(q)))
    if s.counters.get("maxscore_queries", 0):
        assert s.counters["searched_cnt"] < total_postings


def test_maxscore_above_taat_threshold_branch(tiny_index):
    """total postings > taat_threshold routes through the WAND branch,
    which tries MaxScore first (taat_threshold > 0): results stay
    bit-identical to the oracle and the split is used where it exists."""
    import dataclasses

    import pandas as pd

    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(41)
    queries = _mixed_queries(docs, rng, nq=30)
    oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    c = dataclasses.replace(cfg, taat_threshold=1)  # force the > branch
    s = BM25Searcher(idx, c)
    rows = []
    for qid, qt in queries:
        for r, (d, sc) in enumerate(s.topk_for_text(qt)):
            rows.append((qid, r, d, sc))
    res = (
        pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert s.counters.get("maxscore_queries", 0) > 0
    assert len(res) == len(oracle)
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(
        res["score"].to_numpy(), oracle["score"].to_numpy()
    )


def test_maxscore_filtered_rank_identity(tiny_index):
    """filtered_topk (allowed whitelist + denied tombstones) with the
    MaxScore split enabled returns EXACTLY what full accumulation + mask
    + top-k returns — the deleted-docs serving path stays bit-identical."""
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(53)
    queries = _mixed_queries(docs, rng, nq=30)
    all_ids = np.sort(docs["doc_id"].to_numpy().astype(np.uint64))
    allowed = all_ids[::2]
    denied = all_ids[::4]  # subset of allowed: both masks are exercised
    s = BM25Searcher(idx, cfg)
    stats = CorpusStats.load(idx)
    counters: dict = {}
    for qid, qt in queries:
        terms = sorted(set(tokenize(qt)))
        wanted = {
            t: stats.term_locations(t, cfg)
            for t in terms
            if stats.df.get(t, 0) > 0
        }
        fetched = s.reader.fetch_terms(wanted)
        blocks = [b for b in fetched.values() if b is not None]
        for b in blocks:
            b.set_scoring(
                bm25.idf(stats.df[b.term], stats.n_docs),
                stats.avgdl, cfg.k1, cfg.b,
            )
        res = filtered_topk(
            blocks, cfg.topk, allowed, mode="or",
            denied=denied, counters=counters,
        )
        # reference: the pre-split semantics — full accumulation, then
        # the survival mask, then the exact top-k cut
        d, sc, _ = _taat_accumulate(blocks)
        keep = _allowed_mask(d, allowed) & ~_allowed_mask(d, denied)
        ref = _topk_exact(d[keep], sc[keep], cfg.topk) if keep.any() else []
        assert res == ref  # exact doc ids AND float64 scores
    assert counters.get("maxscore_queries", 0) > 0


def test_maxscore_empty_and_singleton_fall_through(tiny_index):
    """No blocks / single term -> no split; behaviour identical to the
    existing TAAT shortcut paths."""
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    s = BM25Searcher(idx, cfg)
    assert _maxscore_accumulate([], cfg.topk) is None
    df = _vocab_by_df(docs)
    t = df.most_common(1)[0][0]
    fetched = s.reader.fetch_terms({t: stats.term_locations(t, cfg)})
    out = topk_from_blocks(fetched, stats, cfg, counters=s.counters)
    assert 0 < len(out) <= cfg.topk
    assert s.counters.get("taat_queries", 0) >= 1  # singleton stayed TAAT
