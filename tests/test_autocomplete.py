"""Prefix autocomplete: brute-force identity + partial-top-n merge."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.pipelines.autocomplete import prefix_suggest


def _dict_table(n_terms: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    alpha = list("abcdef")
    terms = sorted(
        {
            "".join(rng.choice(alpha, size=rng.integers(1, 7)))
            for _ in range(n_terms)
        }
    )
    dfs = rng.integers(1, 500, size=len(terms)).astype(np.int64)
    return pa.table({"term": pa.array(terms), "df": pa.array(dfs)})


def _brute(tbl: pa.Table, prefixes, topn) -> pd.DataFrame:
    df = tbl.to_pandas()
    rows = []
    for p in sorted(set(prefixes)):
        g = df[df["term"].str.startswith(p)].sort_values(
            ["df", "term"], ascending=[False, True], kind="mergesort"
        ).head(topn)
        for r, (_, row) in enumerate(g.iterrows()):
            rows.append((p, r, row["term"], int(row["df"])))
    return pd.DataFrame(rows, columns=["prefix", "rank", "term", "df"])


def test_prefix_suggest_matches_bruteforce():
    tbl = _dict_table(600, seed=5)
    prefixes = ["a", "ab", "abc", "zz", "f"]
    # many small blocks force the partial-top-n merge path
    ds = ray.data.from_arrow(tbl).repartition(13)
    got = prefix_suggest(ds, prefixes, topn=7).reset_index(drop=True)
    want = _brute(tbl, prefixes, topn=7)
    if len(want):
        want = want.astype({"rank": np.int64, "df": np.int64})
    pd.testing.assert_frame_equal(got, want)


def test_prefix_suggest_ties_break_on_term():
    # equal df everywhere -> order must be term-ascending
    tbl = pa.table(
        {
            "term": pa.array(["ax", "aa", "ab", "b"]),
            "df": pa.array([7, 7, 7, 7], type=pa.int64()),
        }
    )
    got = prefix_suggest(ray.data.from_arrow(tbl), ["a"], topn=2)
    assert list(got["term"]) == ["aa", "ab"]
    assert list(got["rank"]) == [0, 1]


def test_prefix_suggest_empty_and_no_match():
    tbl = _dict_table(50, seed=9)
    got = prefix_suggest(ray.data.from_arrow(tbl), ["zzzz"], topn=5)
    assert len(got) == 0
    assert list(got.columns) == ["prefix", "rank", "term", "df"]


def test_fuzzy_suggest_metric_and_ranking(ray_session):
    """prefix_dl == brute min over ALL term prefixes; exact-first
    hard key; min_length exact gate; planted transposition."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.autocomplete import (
        fuzzy_suggest,
        prefix_dl,
    )
    from mini_ivf_ray.pipelines.spell import damerau_levenshtein

    vocab = ["spark", "scan", "small", "sort", "apark", "park", "xq"]
    # brute metric check over every prefix length (not just the 2e+1)
    for p in ("spa", "sap", "par", "sp"):
        for t in vocab:
            brute = min(
                damerau_levenshtein(p, t[:k]) for k in range(len(t) + 1)
            )
            assert prefix_dl(p, t, 1) == min(brute, 2), (p, t)
    ds = ray.data.from_items(
        [{"term": t, "df": 100 - i} for i, t in enumerate(vocab)]
    )
    out = fuzzy_suggest(ds, ["spa", "sap", "sp"], topn=10, max_edits=1)
    g = out[out["prefix"] == "spa"]
    # exact completion (spark, dl 0) first even if fuzzy ones exist
    assert g.iloc[0]["term"] == "spark" and g.iloc[0]["dl"] == 0
    # 'apark'/'park' reachable at dl 1 (deletion/insertion at front)
    assert {"apark", "park"} <= set(g["term"])
    # transposed prefix: 'sap' completes spark via the swap
    g2 = out[out["prefix"] == "sap"]
    assert "spark" in set(g2["term"])
    # min_length: 2-char prefix is exact-only (dl column all 0)
    g3 = out[out["prefix"] == "sp"]
    assert (g3["dl"] == 0).all()
    assert set(g3["term"]) == {"spark"}


def test_context_suggest_ranks_within_context(ray_session):
    """Context df ranking: the same prefix ranks differently in two
    contexts; dead prefix/context empty; df counts are per-doc
    distinct (not cf)."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.autocomplete import context_suggest

    docs = ray.data.from_items(
        [
            {"lang": "en", "text": "sun sun sun sand"},
            {"lang": "en", "text": "sun sand"},
            {"lang": "en", "text": "sand"},
            {"lang": "de", "text": "sand sonne"},
            {"lang": "de", "text": "sand salz"},
        ]
    )
    out = context_suggest(
        docs,
        [(0, "s", "en"), (1, "s", "de"), (2, "zz", "en"),
         (3, "s", "fr")],
        topn=3,
    )
    en = out[out["request_id"] == 0]
    # en: sand df 3 > sun df 2 (repetition inside a doc counts once)
    assert en["term"].tolist() == ["sand", "sun"]
    assert en["df"].tolist() == [3, 2]
    de = out[out["request_id"] == 1]
    # de: sand df 2, then salz/sonne df 1 each (term asc ties)
    assert de["term"].tolist() == ["sand", "salz", "sonne"]
    assert de["df"].tolist() == [2, 1, 1]
    assert (out["request_id"] != 2).all()
    assert (out["request_id"] != 3).all()
