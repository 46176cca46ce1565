"""Rank-feature query (ES rank_feature): local replay identity over
all three functions, boundedness (saturation/sigmoid contrib < boost),
missing-feature = no contribution, zero-boost == plain BM25
bit-identity, parameter contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.pipelines.rankfeature import (
    feature_contrib,
    rank_feature_search,
)
from tests.test_boosting import _plain_bm25

QUERIES = [(0, "the data web"), (1, "w00042 of")]


def _field(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = np.array([float(len(t)) for t in docs["text"]], dtype=np.float64)
    return ids, vals


def _run(idx, cfg, ids, vals, **kw):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    return rank_feature_search(idx, qds, ids, vals, cfg, **kw).to_pandas()


@pytest.mark.parametrize(
    "kw",
    [
        {"function": "saturation", "boost": 2.0, "pivot": 20.0},
        {"function": "log", "boost": 0.5, "scaling_factor": 1.0},
        {"function": "sigmoid", "boost": 2.0, "pivot": 20.0, "exponent": 2.0},
    ],
)
def test_rank_feature_matches_local_replay(tiny_index, kw):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    contrib = feature_contrib(vals, **kw)
    cmap = dict(zip(ids.tolist(), contrib.tolist()))
    res = _run(idx, cfg, ids, vals, **kw)
    assert len(res)
    for qid, text in QUERIES:
        plain = _plain_bm25(docs, idx, text)
        want = sorted(
            ((s + cmap.get(d, 0.0), d) for d, s in plain.items()),
            key=lambda t: (-t[0], t[1]),
        )[: cfg.topk]
        g = res[res["query_id"] == qid].sort_values("rank")
        got = list(zip(g["score"], g["doc_id"].to_numpy().astype(np.uint64)))
        assert [d for _, d in got] == [d for _, d in want], (kw, qid)
        assert np.array_equal(
            np.array([s for s, _ in got]), np.array([s for s, _ in want])
        ), (kw, qid)
    # boundedness: saturation / sigmoid contributions stay < boost
    if kw["function"] != "log":
        assert float(contrib.max()) < kw["boost"]
    # the feature actually reorders vs plain BM25 somewhere
    qds = ray.data.from_items([{"query_id": 0, "text": QUERIES[0][1]}])
    plain_ranked = search(idx, qds, cfg).to_pandas().sort_values("rank")
    g0 = res[res["query_id"] == 0].sort_values("rank")
    assert not np.array_equal(
        g0["score"].to_numpy(), plain_ranked["score"].to_numpy()
    )


def test_rank_feature_missing_and_zero_boost(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    # zero boost: bit-identical to plain BM25
    res = _run(idx, cfg, ids, vals, function="saturation", boost=0.0,
               pivot=10.0).sort_values(["query_id", "rank"])
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    plain = search(idx, qds, cfg).to_pandas().sort_values(
        ["query_id", "rank"]
    )
    assert np.array_equal(res["score"].to_numpy(), plain["score"].to_numpy())
    # empty sidecar: every contribution missing -> plain BM25 again
    res2 = _run(
        idx, cfg, np.empty(0, dtype=np.uint64), np.empty(0),
        function="saturation", boost=5.0, pivot=10.0,
    ).sort_values(["query_id", "rank"])
    assert np.array_equal(res2["score"].to_numpy(), plain["score"].to_numpy())


def test_rank_feature_contracts():
    v = np.array([1.0, 2.0])
    with pytest.raises(ValueError, match="function"):
        feature_contrib(v, function="linear")
    with pytest.raises(ValueError, match="pivot"):
        feature_contrib(v, function="saturation", pivot=0.0)
    with pytest.raises(ValueError, match="scaling_factor"):
        feature_contrib(v, function="log", scaling_factor=0.5)
    with pytest.raises(ValueError, match="exponent"):
        feature_contrib(v, function="sigmoid", exponent=0.0)
    with pytest.raises(ValueError, match="non-negative"):
        feature_contrib(np.array([-1.0]), function="saturation")
    with pytest.raises(ValueError, match="boost"):
        feature_contrib(v, boost=-1.0)
