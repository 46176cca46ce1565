"""Boolean retrieval: parser, complement algebra, brute-force identity."""

import numpy as np
import pytest

from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.boolquery import (
    BooleanSearcher,
    all_terms,
    eval_bool,
    parse_bool,
    positive_terms,
)
from mini_ivf_ray.state.stats import CorpusStats


def _leaf_sets(docs):
    sets: dict[str, set[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for t in set(tokenize(text)):
            sets.setdefault(t, set()).add(int(doc_id))
    return sets


def _brute_eval(expr: str, sets: dict[str, set[int]], universe: set[int]):
    """Reference evaluator: plain set semantics with a real universe."""
    node = parse_bool(expr)

    def ev(n):
        if n.op == "term":
            acc = None
            for t in n.tokens:
                s = sets.get(t, set())
                acc = s if acc is None else acc & s
            return acc
        if n.op == "not":
            return universe - ev(n.children[0])
        parts = [ev(c) for c in n.children]
        out = parts[0]
        for p in parts[1:]:
            out = (out & p) if n.op == "and" else (out | p)
        return out

    return ev(node)


EXPRS = [
    "table AND scan AND NOT window",
    "sort OR merge",
    "(key OR hash) AND join AND NOT (stream OR batch)",
    "data AND NOT (sort AND merge)",
    "table AND zz9999qq",
    "(fast OR slow) AND (scan OR NOT merge)",
    "key AND NOT NOT join",
]


def test_match_sets_equal_reference_semantics(tiny_index):
    idx, cfg, docs = tiny_index
    sets = _leaf_sets(docs)
    universe = {int(d) for d in docs["doc_id"]}
    leaf_docs = {
        t: np.array(sorted(s), dtype=np.uint64) for t, s in sets.items()
    }
    for expr in EXPRS:
        got = set(int(x) for x in eval_bool(parse_bool(expr), leaf_docs))
        want = _brute_eval(expr, sets, universe)
        assert got == want, expr


def test_pure_negation_rejected():
    with pytest.raises(ValueError):
        eval_bool(parse_bool("NOT table"), {})
    with pytest.raises(ValueError):
        eval_bool(parse_bool("NOT (a AND b)"), {})


def test_parse_errors():
    for bad in ["a AND", "(a OR b", "a b)", "AND a", "a OR OR b", ""]:
        with pytest.raises(ValueError):
            parse_bool(bad)


def test_positive_terms_parity():
    n = parse_bool("a AND NOT (b OR NOT c) AND d")
    assert positive_terms(n) == {"a", "c", "d"}
    assert all_terms(n) == {"a", "b", "c", "d"}


def test_searcher_scores_match_manual_bm25(tiny_index):
    idx, cfg, docs = tiny_index
    s = BooleanSearcher(idx, cfg)
    stats = CorpusStats.load(idx)
    sets = _leaf_sets(docs)
    universe = {int(d) for d in docs["doc_id"]}
    dls = {
        int(d): len(tokenize(t)) for d, t in zip(docs["doc_id"], docs["text"])
    }
    tfs = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        toks = tokenize(t)
        for tok in toks:
            tfs[(int(d), tok)] = tfs.get((int(d), tok), 0) + 1

    def manual_score(doc, terms):
        sc = 0.0
        for t in sorted(terms):
            tf = tfs.get((doc, t), 0)
            if not tf or t not in stats.df:
                continue
            idf = bm25.idf(stats.df[t], stats.n_docs)
            sc += idf * (tf * (cfg.k1 + 1.0)) / (
                tf + cfg.k1 * (1.0 - cfg.b + cfg.b * dls[doc] / stats.avgdl)
            )
        return sc

    for expr in EXPRS:
        res = s.boolean_topk_for_expr(expr)
        want_set = _brute_eval(expr, sets, universe)
        pos = positive_terms(parse_bool(expr))
        ranked = sorted(
            ((manual_score(d, pos), d) for d in want_set),
            key=lambda x: (-x[0], x[1]),
        )[: cfg.topk]
        assert [d for _, d in ranked] == [d for d, _ in res], expr
        for (ws, wd), (gd, gs) in zip(ranked, res):
            assert abs(ws - gs) < 1e-9, (expr, wd)
