"""Fuzzy search: expansion exactness + BM25 identity with brute force."""

import numpy as np

from mini_ivf_ray.pipelines.fuzzy import fuzzy_search
from mini_ivf_ray.pipelines.query import brute_force_topk
from mini_ivf_ray.pipelines.spell import levenshtein
from mini_ivf_ray.stages.merge import load_dictionary


def _expand_local(idx, qterms, max_edits, per_term):
    d = load_dictionary(idx)
    terms = d["term"].to_pylist()
    dfs = [int(x) for x in d["df"].to_pylist()]
    out = {}
    for q in qterms:
        cands = [
            (levenshtein(q, t), -df, t)
            for t, df in zip(terms, dfs)
            if levenshtein(q, t) <= max_edits
        ]
        out[q] = [t for _, _, t in sorted(cands)[:per_term]]
    return out


def test_fuzzy_matches_bruteforce_over_local_expansion(tiny_index):
    idx, cfg, docs = tiny_index
    d = load_dictionary(idx)
    some = sorted(d["term"].to_pylist())[:3]
    # perturb real vocab terms: one substitution + one deletion
    q0 = "x" + some[0][1:]
    q1 = some[1][:-1]
    queries = [(0, f"{q0} {q1}"), (1, some[2])]
    res = fuzzy_search(idx, queries, cfg, max_edits=1, per_term=8)
    exp = _expand_local(idx, [q0, q1, some[2]], 1, 8)
    for qid, qtext in queries:
        union = sorted({e for t in qtext.split() for e in exp[t]})
        oracle = brute_force_topk(docs, [(qid, " ".join(union))], cfg)
        o = oracle.sort_values("rank")
        g = res[res["query_id"] == qid].sort_values("rank")
        assert list(g["doc_id"].to_numpy().astype(np.uint64)) == list(
            o["doc_id"].to_numpy().astype(np.uint64)
        ), qid
        assert list(g["score"]) == list(o["score"]), qid


def test_exact_term_is_in_its_own_expansion(tiny_index):
    idx, cfg, docs = tiny_index
    d = load_dictionary(idx)
    t = sorted(d["term"].to_pylist())[0]
    res = fuzzy_search(idx, [(0, t)], cfg, max_edits=0, per_term=8)
    oracle = brute_force_topk(docs, [(0, t)], cfg).sort_values("rank")
    g = res.sort_values("rank")
    assert list(g["doc_id"].to_numpy().astype(np.uint64)) == list(
        oracle["doc_id"].to_numpy().astype(np.uint64)
    )
    assert list(g["score"]) == list(oracle["score"])


def test_unmatchable_query_is_empty(tiny_index):
    idx, cfg, docs = tiny_index
    res = fuzzy_search(idx, [(0, "zzzzzzzzzzzzzzzz")], cfg, max_edits=1)
    assert len(res) == 0
