"""Wildcard search: LIKE-exact expansion, cap determinism, identity."""

import re

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.query import brute_force_topk
from mini_ivf_ray.pipelines.wildcard import (
    expand_wildcards,
    to_like,
    wildcard_search,
)
from mini_ivf_ray.stages.merge import load_dictionary


def _like_re(pattern: str) -> re.Pattern:
    parts = (re.escape(c) for c in pattern)
    return re.compile(
        "^" + "".join(
            ".*" if c == r"\*" else "." if c == r"\?" else c for c in parts
        ) + "$"
    )


def test_expansion_matches_like_semantics(tiny_index):
    idx, cfg, docs = tiny_index
    d = load_dictionary(idx)
    terms = d["term"].to_pylist()
    dfs = dict(zip(terms, (int(x) for x in d["df"].to_pylist())))
    ds = ray.data.from_arrow(d.select(["term", "df"])).repartition(5)
    pats = ["w00*", "*1", "w?01?", "zz*"]
    got = expand_wildcards(ds, pats, max_expansions=1_000_000)
    for p in pats:
        rx = _like_re(p)
        want = sorted(
            (t for t in terms if rx.match(t)),
            key=lambda t: (-dfs[t], t),
        )
        sub = got[got["pattern"] == p]
        assert list(sub["term"]) == want, p


def test_expansion_cap_is_deterministic(tiny_index):
    idx, cfg, docs = tiny_index
    d = load_dictionary(idx)
    ds = ray.data.from_arrow(d.select(["term", "df"])).repartition(7)
    full = expand_wildcards(ds, ["w*"], max_expansions=1_000_000)
    capped = expand_wildcards(ds, ["w*"], max_expansions=3)
    assert len(capped) == 3
    assert list(capped["term"]) == list(full["term"][:3])


def test_search_identity_with_bruteforce(tiny_index):
    idx, cfg, docs = tiny_index
    d = load_dictionary(idx)
    ds = ray.data.from_arrow(d.select(["term", "df"]))
    pats = [(0, "w00*"), (1, "*a"), (2, "zzzz*")]
    exp = expand_wildcards(ds, [p for _, p in pats], max_expansions=64)
    res = wildcard_search(idx, pats, cfg, max_expansions=64)
    assert set(res["query_id"]) <= {0, 1}
    for qid, p in pats[:2]:
        terms = list(exp[exp["pattern"] == p]["term"])
        oracle = brute_force_topk(docs, [(qid, " ".join(terms))], cfg)
        o = oracle.sort_values("rank")
        g = res[res["query_id"] == qid].sort_values("rank")
        assert list(g["doc_id"].to_numpy().astype(np.uint64)) == list(
            o["doc_id"].to_numpy().astype(np.uint64)
        ), p
        assert list(g["score"]) == list(o["score"]), p


def test_no_match_and_bad_pattern(tiny_index):
    idx, cfg, docs = tiny_index
    res = wildcard_search(idx, [(0, "zz9999qq*")], cfg)
    assert len(res) == 0
    with pytest.raises(ValueError):
        to_like("bad%pattern")
