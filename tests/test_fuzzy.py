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


def test_damerau_matches_duckdb_on_random_pairs():
    """The Lowrance-Wagner full DL == DuckDB's damerau_levenshtein
    (the SQL oracle's metric), incl. the full-vs-OSA divergence."""
    import random

    import duckdb

    from mini_ivf_ray.pipelines.spell import damerau_levenshtein

    con = duckdb.connect()
    # the canonical full-DL-vs-OSA witness: edit inside a transposed
    # pair — full DL 2, restricted/OSA 3
    assert damerau_levenshtein("ca", "abc") == 2
    assert (
        con.execute("select damerau_levenshtein('ca','abc')").fetchone()[0]
        == 2
    )
    rng = random.Random(7)
    for _ in range(500):
        a = "".join(rng.choices("abcd", k=rng.randint(0, 6)))
        b = "".join(rng.choices("abcd", k=rng.randint(0, 6)))
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)
    # cap short-circuit never under-reports
    assert damerau_levenshtein("abcdefgh", "zzzzzzzz", cap=2) == 3


def test_symspell_candidates_complete_under_damerau():
    """suggest_terms(transpositions=True) finds EVERY vocab term
    within DL <= e (the SymSpell delete-key sharing guarantee holds
    for the transposition edit)."""
    import ray.data

    from mini_ivf_ray.pipelines.spell import (
        damerau_levenshtein,
        suggest_terms,
    )

    vocab = [
        "spark", "saprk", "parks", "table", "tabel", "cable",
        "join", "jion", "lion", "ab", "ba", "ca", "abc",
    ]
    ds = ray.data.from_items(
        [{"term": t, "df": 10 + i} for i, t in enumerate(vocab)]
    )
    for e in (1, 2):
        sug = suggest_terms(
            ds, ["spark", "tabel", "jion", "ca"], max_edits=e,
            topn=100, transpositions=True,
        )
        got = {
            (q, s)
            for q, s in zip(sug["query"], sug["suggestion"])
        }
        for q in ("spark", "tabel", "jion", "ca"):
            for t in vocab:
                if damerau_levenshtein(q, t) <= e:
                    assert (q, t) in got, (q, t, e)
        # and the lev column really is DL
        for q, s, d in zip(sug["query"], sug["suggestion"], sug["lev"]):
            assert d == damerau_levenshtein(q, s)


def test_transposition_gate_bites(tiny_index):
    """An adjacent-swap typo of a real vocab term matches at
    max_edits=1 ONLY with transpositions=True; with it, ranking ==
    the un-typo'd fuzzy ranking whenever the swap is the sole typo
    and expansions agree."""
    from mini_ivf_ray.stages.merge import load_dictionary

    idx, cfg, docs = tiny_index
    # pick a vocab term with distinct adjacent chars to swap
    terms = sorted(load_dictionary(idx)["term"].to_pylist())
    base = next(
        t for t in terms if len(t) >= 4 and t[1] != t[2]
    )
    typo = base[0] + base[2] + base[1] + base[3:]
    assert typo != base
    queries = [(0, typo)]
    with_t = fuzzy_search(
        idx, queries, cfg, max_edits=1, per_term=8, transpositions=True
    )
    without = fuzzy_search(
        idx, queries, cfg, max_edits=1, per_term=8, transpositions=False
    )
    assert len(with_t), (base, typo)
    # the swapped term is reachable only via the transposition edit:
    # without it, the expansion can't contain `base` (lev(typo, base)
    # = 2 when the swapped chars differ), so `base`-only docs are
    # reachable only with transpositions
    from mini_ivf_ray.pipelines.spell import levenshtein

    assert levenshtein(typo, base) == 2
    exp_without = set()
    for t in terms:
        if levenshtein(typo, t) <= 1:
            exp_without.add(t)
    assert base not in exp_without
    if not len(without):
        return  # nothing else within lev 1 — the gate fully decided
    # otherwise the two result sets must differ (base's postings join)
    a = set(map(int, with_t["doc_id"]))
    b = set(map(int, without["doc_id"]))
    assert a != b
