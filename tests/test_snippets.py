"""Snippet generation: window rule edges + blocking independence."""

import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.pipelines.snippets import (
    snippet_for_tokens,
    snippets_for_results,
)


def test_window_rule_edges():
    toks = "a b c d e f g h".split()
    # first occurrence, centered
    assert snippet_for_tokens(toks, [("d", 5)], window=2) == ("d", "b c d e f")
    # clipped at the start
    assert snippet_for_tokens(toks, [("a", 5)], window=3) == ("a", "a b c d")
    # clipped at the end
    assert snippet_for_tokens(toks, [("h", 5)], window=3) == ("h", "e f g h")
    # most selective term wins (min df), not the first listed
    assert snippet_for_tokens(toks, [("b", 9), ("g", 2)], window=1)[0] == "g"
    # df tie -> term asc
    assert snippet_for_tokens(toks, [("c", 4), ("b", 4)], window=0) == ("b", "b")
    # FIRST occurrence of the best term
    assert snippet_for_tokens(
        "x y x z".split(), [("x", 1)], window=1
    ) == ("x", "x y")
    # no query term present
    assert snippet_for_tokens(toks, [("zz", 1)], window=2) is None


def test_snippets_blocking_independence():
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(30)), type=pa.int64()),
            "text": [f"alpha beta w{i} gamma delta" for i in range(30)],
        }
    )
    results = pd.DataFrame(
        {"query_id": [0, 0, 1], "doc_id": [3, 7, 3], "rank": [0, 1, 0]}
    )
    qterms = {0: [("beta", 30), ("w3", 1)], 1: [("gamma", 30)]}
    one = snippets_for_results(
        ray.data.from_arrow(docs), results, qterms, window=1
    )
    many = snippets_for_results(
        ray.data.from_arrow(docs).repartition(11), results, qterms, window=1
    )
    pd.testing.assert_frame_equal(one, many)
    # doc 3 under query 0 picks the rarer w3; under query 1, gamma
    assert one[(one.query_id == 0) & (one.doc_id == 3)].term.iloc[0] == "w3"
    assert one[(one.query_id == 1) & (one.doc_id == 3)].term.iloc[0] == "gamma"
    assert one[(one.query_id == 0) & (one.doc_id == 3)].snippet.iloc[0] == "beta w3 gamma"
