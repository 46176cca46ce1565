"""String stats aggregation (ES string_stats): local replay identity
against a brute-force character walk, sharded == single, analytic
entropy pins (uniform == log2 k, single label == 0), kernel metadata
unit test."""

import math
from collections import Counter

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.stringstats import (
    STRING_COLUMNS,
    label_char_matrix,
    string_stats_reduce,
    string_stats_search,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]


def _attr(docs, k: int, prefix: str):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    return ids, [f"{prefix}{int(d) % k}" for d in ids]


def _match_ids(docs, qtext):
    terms = set(tokenize(qtext))
    return {
        int(d)
        for d, t in zip(docs["doc_id"], docs["text"])
        if terms & set(tokenize(t))
    }


def _qds(queries=QUERIES):
    return ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )


def _brute(docs, qtext, amap):
    vals = [amap[d] for d in _match_ids(docs, qtext)]
    if not vals:
        return None
    chars = Counter("".join(vals))
    total = sum(chars.values())
    ent = -sum((c / total) * math.log2(c / total) for c in chars.values())
    return (
        len(vals),
        min(len(s) for s in vals),
        max(len(s) for s in vals),
        sum(len(s) for s in vals) / len(vals),
        ent,
    )


def test_string_stats_matches_brute_force(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _attr(docs, 13, "lbl")  # lbl0..lbl12: lengths 4 and 5
    got = string_stats_search(idx, _qds(), ids, vals, cfg)
    amap = dict(zip(ids.tolist(), vals))
    assert len(got) == len(QUERIES)
    for qid, qtext in QUERIES:
        n, mn, mx, avg, ent = _brute(docs, qtext, amap)
        row = got[got["query_id"] == qid].iloc[0]
        assert int(row["n_docs"]) == n
        assert int(row["min_len"]) == mn and int(row["max_len"]) == mx
        assert row["avg_len"] == avg
        assert abs(row["entropy"] - ent) < 1e-9
        assert mn < mx  # length spread non-vacuous


def test_string_stats_sharded_equals_single(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, vals = _attr(docs, 13, "lbl")
    single = string_stats_search(idx, _qds(), ids, vals, cfg)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        sharded.attach_sidecar(ids, vals)
        got = sharded.string_stats(QUERIES)
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    for c in STRING_COLUMNS:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c


def test_entropy_analytic_pins():
    # uniform over k equally-frequent single-char labels: log2(k)
    panel = pd.DataFrame(
        {
            "query_id": [0] * 4,
            "facet": ["a", "b", "c", "d"],
            "n_docs": [5, 5, 5, 5],
        }
    )
    out = string_stats_reduce(panel)
    assert out["entropy"].iloc[0] == 2.0  # log2(4), exact in float64
    assert out["avg_len"].iloc[0] == 1.0
    # one repeated label: entropy of its own char mix; single char -> 0
    panel = pd.DataFrame(
        {"query_id": [1], "facet": ["aaaa"], "n_docs": [7]}
    )
    out = string_stats_reduce(panel)
    assert out["entropy"].iloc[0] == 0.0
    assert int(out["min_len"].iloc[0]) == 4
    # empty panel keeps schema
    assert list(string_stats_reduce(pd.DataFrame()).columns) == STRING_COLUMNS


def test_label_char_matrix():
    alphabet, C, lengths = label_char_matrix(["ab", "ba", "aab"])
    assert alphabet == ["a", "b"]
    assert C.tolist() == [[1, 1], [1, 1], [2, 1]]
    assert lengths.tolist() == [2, 2, 3]
