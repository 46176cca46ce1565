"""Proximity search: window predicate + brute-force identity."""

import dataclasses

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.phrase import proximity_topk, within_window
from mini_ivf_ray.pipelines.query import brute_force_topk


def test_within_window_unit():
    toks = "a x b y a b c".split()
    assert within_window(toks, ["a", "b"], 2)  # positions 4,5
    assert within_window(toks, ["a", "b"], 3)
    assert not within_window(toks, ["a", "c"], 2)  # best span a@4..c@6 = 3
    assert within_window(toks, ["a", "c"], 3)
    assert within_window(toks, ["a", "b", "c"], 3)  # 4,5,6
    assert not within_window(toks, ["a", "b", "c"], 2)
    assert within_window(toks, ["x"], 1)  # single term: any occurrence
    assert not within_window(toks, ["zz"], 5)
    assert not within_window(toks, ["a", "b"], 0)
    # multiplicity: the window must cover DISTINCT terms, repeats free
    assert within_window("q q q".split(), ["q"], 1)


def _brute_prox(docs, queries, cfg):
    wide = dataclasses.replace(cfg, topk=max(len(docs), 1))
    texts = {int(d): tokenize(t) for d, t in zip(docs["doc_id"], docs["text"])}
    scored = brute_force_topk(
        docs, [(q, t) for q, t, _ in queries], wide, mode="and"
    )
    rows = []
    for qid, text, w in queries:
        terms = sorted(set(tokenize(text)))
        sub = scored[scored["query_id"] == qid]
        keep = [
            (int(d), float(s))
            for d, s in zip(sub["doc_id"], sub["score"])
            if within_window(texts[int(d)], terms, w)
        ]
        keep.sort(key=lambda x: (-x[1], x[0]))
        rows.extend((qid, r, d, s) for r, (d, s) in enumerate(keep[: cfg.topk]))
    return rows


def test_proximity_matches_bruteforce(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [
        (0, "key table", 3),
        (1, "sort merge", 5),
        (2, "fast scan join", 10),
        (3, "data zz9999qq", 4),
        (4, "window", 1),  # single term: == conjunctive matches
    ]
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = proximity_topk(idx, docs_ds, queries, cfg)
    want = _brute_prox(docs, queries, cfg)
    got_rows = [
        (int(q), int(r), int(d), float(s))
        for q, r, d, s in zip(
            got["query_id"], got["rank"], got["doc_id"], got["score"]
        )
    ]
    assert len(got_rows) == len(want)
    for (gq, gr, gd, gs), (wq, wr, wd, ws) in zip(got_rows, want):
        assert (gq, gr, gd) == (wq, wr, wd)
        assert gs == ws  # bit-identical conjunctive scores


def test_window_one_with_two_terms_is_empty(tiny_index):
    idx, cfg, docs = tiny_index
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = proximity_topk(idx, docs_ds, [(0, "key table", 1)], cfg)
    assert len(got) == 0


def test_huge_window_equals_conjunctive(tiny_index):
    idx, cfg, docs = tiny_index
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = proximity_topk(idx, docs_ds, [(0, "key table", 10_000)], cfg)
    oracle = brute_force_topk(docs, [(0, "key table")], cfg, mode="and")
    np.testing.assert_array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(
        got["score"].to_numpy(), oracle["score"].to_numpy()
    )
