"""Keyset pagination (search_after): page-stitching identity.

Pinned invariants:
* concatenating cursor-driven pages of k reproduces the single top-3k
  ranking EXACTLY (docs, float64 scores, order) — no page-boundary
  drift, score ties at the cursor handled by the (score, doc_id) key;
* a cursor past the last match returns an empty page (no error);
* the cursor path counts through the after_queries counter;
* search_after on filtered/conjunctive retrieval raises (documented
  boundary, not silent wrong results).
"""

import dataclasses

import numpy as np
import pytest

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


def test_cursor_on_filtered_path_raises(tiny_index):
    idx, cfg, _docs = tiny_index
    import ray

    allowed = ray.put(np.array([1, 2, 3], dtype=np.uint64))
    s = BM25Searcher(idx, cfg, allowed_ref=allowed)
    with pytest.raises(NotImplementedError):
        s.topk_for_text("the", after=(1.0, 0))
