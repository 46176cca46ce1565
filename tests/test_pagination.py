"""Keyset pagination (search_after): page-stitching identity.

Pinned invariants:
* concatenating cursor-driven pages of k reproduces the single top-3k
  ranking EXACTLY (docs, float64 scores, order) — no page-boundary
  drift, score ties at the cursor handled by the (score, doc_id) key;
* a cursor past the last match returns an empty page (no error);
* the cursor path counts through the after_queries counter;
* cursors COMPOSE with filtered / conjunctive / tombstoned retrieval:
  a filtered page 2 stitches exactly onto the filtered page 1 (the
  masks apply before the cursor cut, same pre-top-k semantics as
  filtered_topk).
"""

import dataclasses

import numpy as np

from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, brute_force_topk


def _queries(docs, rng, nq=25):
    vocab = sorted({t for text in docs["text"] for t in tokenize(text)})
    qs = []
    for qid in range(nq):
        n = int(rng.integers(1, 4))
        qs.append(
            (qid, " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)))
        )
    return qs


def test_pages_stitch_to_single_topk(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(41)
    queries = _queries(docs, rng)
    k = cfg.topk
    cfg30 = dataclasses.replace(cfg, topk=3 * k)
    oracle = brute_force_topk(docs, queries, cfg30)
    s = BM25Searcher(idx, cfg)
    for qid, qt in queries:
        want = oracle[oracle["query_id"] == qid].sort_values("rank")
        got = []
        after = None
        for _ in range(3):
            page = s.topk_for_text(qt, after=after)
            got.extend(page)
            if len(page) < k:
                break
            after = (page[-1][1], page[-1][0])
        want_pairs = list(
            zip(want["doc_id"].astype(np.uint64), want["score"])
        )[: len(got)]
        assert len(got) == min(len(want), 3 * k), (qid, qt)
        for (gd, gs), (wd, ws) in zip(got, want_pairs):
            assert np.uint64(gd) == np.uint64(wd), (qid, qt)
            assert np.float64(gs) == np.float64(ws), (qid, qt)
    assert s.counters.get("after_queries", 0) > 0


def test_cursor_past_end_is_empty(tiny_index):
    idx, cfg, _docs = tiny_index
    s = BM25Searcher(idx, cfg)
    # score strictly below every real BM25 sum -> nothing after it
    assert s.topk_for_text("the", after=(-1e18, 0)) == []


def _stitch_pages(searcher, qtext, pages, k):
    got = []
    after = None
    for _ in range(pages):
        page = searcher.topk_for_text(qtext, after=after)
        got.extend(page)
        if len(page) < k:
            break
        after = (page[-1][1], page[-1][0])
    return got


def _assert_pairs(got, want_pairs, ctx):
    assert len(got) == len(want_pairs), ctx
    for (gd, gs), (wd, ws) in zip(got, want_pairs):
        assert np.uint64(gd) == np.uint64(wd), ctx
        assert np.float64(gs) == np.float64(ws), ctx


def test_filtered_pages_stitch_to_filtered_topk(tiny_index):
    """allowed-mask cursors: stitched filtered pages == the filtered
    top-3k ranking, scores bit-identical to the unfiltered scores of
    the surviving docs (corpus-wide statistics)."""
    import ray

    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(43)
    queries = _queries(docs, rng, nq=12)
    k = cfg.topk
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    allowed = np.sort(ids[ids % 3 != 0])
    # full ranking, THEN filter — truncating before the mask would drop
    # filtered-tail docs that belong on page 2/3
    cfg_all = dataclasses.replace(cfg, topk=len(docs))
    oracle = brute_force_topk(docs, queries, cfg_all)
    oracle = oracle[
        oracle["doc_id"].astype(np.uint64).isin(allowed)
    ]
    s = BM25Searcher(idx, cfg, allowed_ref=ray.put(allowed))
    for qid, qt in queries:
        want = oracle[oracle["query_id"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        got = _stitch_pages(s, qt, 3, k)
        want_pairs = list(
            zip(want["doc_id"].astype(np.uint64), want["score"])
        )[: len(got)]
        assert len(got) == min(len(want), 3 * k), (qid, qt)
        _assert_pairs(got, want_pairs, (qid, qt))
    assert s.counters.get("after_queries", 0) > 0


def test_conjunctive_pages_stitch(tiny_index):
    """mode='and' cursors: stitched pages == the conjunctive ranking."""
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(44)
    queries = [
        (qid, f"{qt} the") for qid, qt in _queries(docs, rng, nq=8)
    ]
    k = cfg.topk
    cfg30 = dataclasses.replace(cfg, topk=3 * k)
    oracle = brute_force_topk(docs, queries, cfg30, mode="and")
    s = BM25Searcher(idx, cfg, mode="and")
    for qid, qt in queries:
        want = oracle[oracle["query_id"] == qid].sort_values("rank")
        got = _stitch_pages(s, qt, 3, k)
        want_pairs = list(
            zip(want["doc_id"].astype(np.uint64), want["score"])
        )[: len(got)]
        assert len(got) == min(len(want), 3 * k), (qid, qt)
        _assert_pairs(got, want_pairs, (qid, qt))


def test_tombstoned_cursor_skips_denied(tiny_index):
    """denied docs never surface from any page: deleting the whole
    unfiltered page 2 makes the old page 3 the new page 2, and page
    boundaries stay exact."""
    import ray

    idx, cfg, _docs = tiny_index
    k = cfg.topk
    s0 = BM25Searcher(idx, cfg)
    qt = "the data"
    p1 = s0.topk_for_text(qt)
    assert len(p1) == k
    after = (p1[-1][1], p1[-1][0])
    p2 = s0.topk_for_text(qt, after=after)
    p3 = s0.topk_for_text(qt, after=(p2[-1][1], p2[-1][0])) if len(
        p2
    ) == k else []
    denied = np.sort(np.array([d for d, _ in p2], dtype=np.uint64))
    s1 = BM25Searcher(idx, cfg, denied_ref=ray.put(denied))
    p1_d = s1.topk_for_text(qt)
    assert [d for d, _ in p1_d] == [d for d, _ in p1]  # page 1 untouched
    p2_d = s1.topk_for_text(qt, after=after)
    _assert_pairs(p2_d, [(d, sc) for d, sc in p3[: len(p2_d)]], qt)
    for d, _sc in p2_d:
        assert np.uint64(d) not in denied
