"""Spell correction: exact-metric identity + suggestion correctness."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.pipelines.spell import (
    deletion_keys,
    levenshtein,
    suggest_terms,
)


def _lev_ref(a, b):
    """Textbook O(nm) DP, the ground truth."""
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[la][lb]


def test_levenshtein_matches_reference():
    rng = np.random.default_rng(3)
    alpha = "abcde"
    words = [
        "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
        for _ in range(40)
    ]
    for a in words[:20]:
        for b in words[20:]:
            assert levenshtein(a, b) == _lev_ref(a, b), (a, b)
    # cap short-circuit never under-reports within the cap
    for a in words[:10]:
        for b in words[10:20]:
            true = _lev_ref(a, b)
            got = levenshtein(a, b, cap=2)
            assert got == true if true <= 2 else got > 2


def test_deletion_keys():
    assert deletion_keys("ab", 1) == {"ab", "a", "b"}
    assert "" in deletion_keys("ab", 2)
    assert deletion_keys("x", 0) == {"x"}


def test_suggest_matches_bruteforce():
    vocab = pd.DataFrame(
        {
            "term": ["batch", "catch", "match", "data", "date", "gate",
                     "stream", "steam", "scan", "scant", "plan"],
            "df": [400, 30, 50, 395, 100, 20, 390, 10, 398, 5, 60],
        }
    )
    queries = ["bacth", "daat", "steem", "scann", "zzzzzz", "plan"]
    got = suggest_terms(
        ray.data.from_arrow(__import__("pyarrow").Table.from_pandas(vocab)),
        queries, max_edits=2, topn=3,
    )

    # brute-force reference: full DP scan over the vocab
    rows = []
    for q in queries:
        cand = [
            (t, _lev_ref(q, t), df)
            for t, df in zip(vocab["term"], vocab["df"])
            if _lev_ref(q, t) <= 2
        ]
        cand.sort(key=lambda x: (x[1], -x[2], x[0]))
        for r, (t, lev, df) in enumerate(cand[:3]):
            rows.append((q, t, lev, df, r))
    ref = pd.DataFrame(
        rows, columns=["query", "suggestion", "lev", "df", "rank"]
    ).sort_values(["query", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"lev": np.int64, "df": np.int64, "rank": np.int64}), ref.astype({"lev": np.int64, "df": np.int64, "rank": np.int64})
    )
    # the exact-match query suggests itself at distance 0, rank 0
    assert got[(got["query"] == "plan") & (got["rank"] == 0)][
        "suggestion"
    ].iloc[0] == "plan"
    # no suggestion for the hopeless query
    assert (got["query"] == "zzzzzz").sum() == 0


def test_suggest_blocking_independence():
    """Same output whatever the dictionary's block layout (the probe is
    a stateless per-batch map; candidates merge on the driver)."""
    import pyarrow as pa

    vocab = pd.DataFrame(
        {"term": [f"term{i:03d}" for i in range(200)] + ["hello"],
         "df": list(range(1, 201)) + [77]}
    )
    t = pa.Table.from_pandas(vocab)
    one = suggest_terms(
        ray.data.from_arrow(t), ["helo", "term00"], topn=5
    )
    many = suggest_terms(
        ray.data.from_arrow(t).repartition(13), ["helo", "term00"], topn=5
    )
    pd.testing.assert_frame_equal(
        one.reset_index(drop=True), many.reset_index(drop=True)
    )


def test_sort_frequency_mode_diverges(tiny_index):
    """sort=frequency ranks (df desc, lev asc) — on a candidate set
    with inverted df/lev order the two modes provably disagree; both
    rank over the SAME candidate set."""
    from mini_ivf_ray.pipelines.spell import (
        levenshtein,
        suggest_for_index,
    )

    idx, cfg, docs = tiny_index
    from mini_ivf_ray.stages.merge import load_dictionary

    terms = sorted(load_dictionary(idx)["term"].to_pylist())
    q = terms[0][:-1] + "x" if len(terms[0]) > 2 else "thx"
    a = suggest_for_index(idx, [q], max_edits=2, topn=50, sort="score")
    b = suggest_for_index(idx, [q], max_edits=2, topn=50,
                          sort="frequency")
    assert set(a["suggestion"]) == set(b["suggestion"])  # same set
    # contract: score mode is lev-major, frequency mode df-major
    if len(a) > 1:
        assert list(a["lev"]) == sorted(a["lev"])
        assert list(b["df"]) == sorted(b["df"], reverse=True)
    import pytest

    with pytest.raises(ValueError, match="sort"):
        suggest_for_index(idx, [q], sort="bogus")
