"""Rare-terms + multi-terms aggregations (ES rare_terms /
multi_terms): local replay identity, sharded == single with a
non-vacuous global-vs-shard-local rarity pin, cut determinism,
separator/null/bounds contracts."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.termsagg import (
    MULTI_COLUMNS,
    RARE_COLUMNS,
    SEP,
    _composite_labels,
    multi_cut,
    multi_terms_search,
    rare_cut,
    rare_terms_search,
)

QUERIES = [(0, "w00042 w00007"), (1, "the data")]


def _attr(docs, k: int, prefix: str):
    """Deterministic k-ary attribute from the doc id."""
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


def _local_panel(docs, queries, ids, vals):
    amap = dict(zip(ids.tolist(), vals))
    rows = []
    for qid, qtext in queries:
        from collections import Counter

        c = Counter(amap[d] for d in _match_ids(docs, qtext))
        rows.extend((qid, k, n) for k, n in c.items())
    return pd.DataFrame(rows, columns=RARE_COLUMNS)


def test_rare_terms_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _attr(docs, 40, "s")
    m = 3
    got = rare_terms_search(idx, _qds(), ids, vals, m, cfg)
    panel = _local_panel(docs, QUERIES, ids, vals)
    want = rare_cut(panel, m)
    # the filter provably bites in BOTH directions somewhere
    assert 0 < len(want) < len(panel)
    assert got[RARE_COLUMNS].to_dict("list") == want[RARE_COLUMNS].to_dict(
        "list"
    )
    assert (got["n_docs"] <= m).all()


def test_rare_terms_sharded_equals_single_post_merge(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, vals = _attr(docs, 40, "s")
    m = 3
    single = rare_terms_search(idx, _qds(), ids, vals, m, cfg)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_sidecar"):
            sharded.rare_terms(QUERIES, m)
        sharded.attach_sidecar(ids, vals)
        got = sharded.rare_terms(QUERIES, m)
        # non-vacuity of the post-merge rule: some bucket is globally
        # over the cut while its count in SOME shard alone is under it
        # (shard-local filtering would wrongly emit it)
        panel = _local_panel(docs, QUERIES, ids, vals)
        over = panel[panel["n_docs"] > m]
        amap = dict(zip(ids.tolist(), vals))
        bounds = sharded.bounds
        witnessed = False
        for _, r in over.iterrows():
            mdocs = [
                d
                for d in _match_ids(docs, dict(QUERIES)[r["query_id"]])
                if amap[d] == r["facet"]
            ]
            for s in range(len(bounds) - 1):
                c = sum(1 for d in mdocs if bounds[s] <= d < bounds[s + 1])
                if 0 < c <= m:
                    witnessed = True
        assert witnessed
    finally:
        sharded.shutdown()
    for c in RARE_COLUMNS:
        assert got[c].tolist() == single[c].tolist(), c


def test_multi_terms_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, va = _attr(docs, 3, "a")
    _, vb = _attr(docs, 5, "b")
    got = multi_terms_search(idx, _qds(), ids, va, vb, 4, cfg)
    amap = dict(zip(ids.tolist(), va))
    bmap = dict(zip(ids.tolist(), vb))
    for qid, qtext in QUERIES:
        from collections import Counter

        c = Counter((amap[d], bmap[d]) for d in _match_ids(docs, qtext))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        g = got[got["query_id"] == qid]
        assert [
            (a, b, n)
            for a, b, n in zip(g["key_a"], g["key_b"], g["n_docs"])
        ] == [(a, b, n) for (a, b), n in want]
        # the cut bites: the full panel exceeds num_buckets
        assert len(c) > 4


def test_multi_terms_sharded_equals_single(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex
    from mini_ivf_ray.pipelines.termsagg import _composite_labels

    idx, cfg, docs = tiny_index
    ids, va = _attr(docs, 3, "a")
    _, vb = _attr(docs, 5, "b")
    single = multi_terms_search(idx, _qds(), ids, va, vb, 4, cfg)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        sharded.attach_sidecar(ids, _composite_labels(va, vb))
        got = sharded.multi_terms(QUERIES, 4)
    finally:
        sharded.shutdown()
    for c in MULTI_COLUMNS:
        assert got[c].tolist() == single[c].tolist(), c


def test_cut_kernels_and_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _attr(docs, 40, "s")
    with pytest.raises(ValueError, match="max_doc_count"):
        rare_terms_search(idx, _qds(), ids, vals, 0, cfg)
    with pytest.raises(ValueError, match="num_buckets"):
        multi_terms_search(idx, _qds(), ids, vals, vals, 0, cfg)
    # separator-bearing composite keys refused loudly
    bad = list(vals)
    bad[3] = f"x{SEP}y"
    with pytest.raises(ValueError, match="separator"):
        _composite_labels(bad, vals)
    with pytest.raises(ValueError, match="null"):
        _composite_labels([None] * len(vals), vals)
    # empty panels keep their schema
    assert list(rare_cut(pd.DataFrame(), 1).columns) == RARE_COLUMNS
    assert list(multi_cut(pd.DataFrame(), 1).columns) == MULTI_COLUMNS
    # multi_cut tie-break: count desc, then key_a asc, then key_b asc
    panel = pd.DataFrame(
        {
            "query_id": [0] * 4,
            "facet": [f"a{SEP}z", f"a{SEP}y", f"b{SEP}a", f"a{SEP}x"],
            "n_docs": [2, 2, 3, 2],
        }
    )
    out = multi_cut(panel, 3)
    assert list(zip(out["key_a"], out["key_b"])) == [
        ("b", "a"), ("a", "x"), ("a", "y"),
    ]
