"""Range aggregation (ES range): local replay identity with
overlapping/open ranges, multi-membership pin, sharded == single
bit-identity, zero-bucket omission, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.rangeagg import (
    range_buckets_search,
    range_partials,
    validate_ranges,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]
RANGES = [("short", None, 60), ("mid", 40, 90), ("long", 80, None)]


def _field(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = np.array([float(len(t)) for t in docs["text"]], dtype=np.float64)
    return ids, vals


def _match_ids(docs, qtext):
    terms = set(tokenize(qtext))
    return {
        int(d)
        for d, t in zip(docs["doc_id"], docs["text"])
        if terms & set(tokenize(t))
    }


def _local(docs, queries, ids, vals, ranges):
    import pandas as pd

    vmap = dict(zip(ids.tolist(), vals.tolist()))
    norm = validate_ranges(ranges)
    rows = []
    for qid, qtext in queries:
        vs = np.array(
            sorted(vmap[d] for d in _match_ids(docs, qtext) if d in vmap)
        )
        for key, n, s in range_partials(vs, norm):
            rows.append((qid, key, n, s / n))
    return pd.DataFrame(
        rows, columns=["query_id", "range_key", "n_docs", "avg_v"]
    ).sort_values(["query_id", "range_key"]).reset_index(drop=True)


def _run(idx, cfg, docs, queries=QUERIES, ranges=RANGES):
    import pandas as pd

    ids, vals = _field(docs)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    df = range_buckets_search(idx, qds, ids, vals, ranges, cfg).to_pandas()
    if not len(df):
        return pd.DataFrame(
            columns=["query_id", "range_key", "n_docs", "avg_v"]
        )
    return df.sort_values(["query_id", "range_key"]).reset_index(drop=True)


def test_range_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    got = _run(idx, cfg, docs)
    want = _local(docs, QUERIES, ids, vals, RANGES)
    assert len(got) == len(want) and len(got) > 0
    for c in got.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    # multi-membership is non-vacuous: overlapping ranges double-count,
    # so per-query bucket totals exceed the match-set size somewhere
    m0 = len(_match_ids(docs, QUERIES[0][1]))
    q0 = got[got["query_id"] == 0]
    assert int(q0["n_docs"].sum()) > m0


def test_range_sharded_identity(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    single = _run(idx, cfg, docs)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_value_sidecar"):
            sharded.range_buckets(QUERIES, RANGES)
        sharded.attach_value_sidecar(ids, vals)
        got = (
            sharded.range_buckets(QUERIES, RANGES)
            .sort_values(["query_id", "range_key"])
            .reset_index(drop=True)
        )
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    for c in single.columns:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c


def test_range_zero_bucket_omitted_and_open_ends(tiny_index):
    idx, cfg, docs = tiny_index
    # a range beyond every value yields no row for any query
    got = _run(idx, cfg, docs, ranges=[("none", 10_000, None), ("all", None, None)])
    assert set(got["range_key"]) == {"all"}
    # the fully-open range counts the entire field-carrying match set
    m0 = len(_match_ids(docs, QUERIES[0][1]))
    assert int(got[got["query_id"] == 0]["n_docs"].iloc[0]) == m0
    # OOV query: no rows at all
    oov = _run(idx, cfg, docs, queries=[(7, "zzqq9999xx")])
    assert len(oov) == 0


def test_range_contracts():
    with pytest.raises(ValueError, match=">= 1 range"):
        validate_ranges([])
    with pytest.raises(ValueError, match="duplicate"):
        validate_ranges([("a", 0, 1), ("a", 1, 2)])
    with pytest.raises(ValueError, match="must be <"):
        validate_ranges([("a", 5, 5)])
    with pytest.raises(ValueError, match="NaN"):
        validate_ranges([("a", float("nan"), 5)])
    # partials: from inclusive, to exclusive, overlap double-counts
    v = np.array([1.0, 2.0, 3.0])
    parts = range_partials(v, validate_ranges([("lo", 1, 3), ("hi", 2, None)]))
    assert parts == [("lo", 2, 3.0), ("hi", 2, 5.0)]
