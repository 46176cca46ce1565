"""Weighted-avg + top-metrics aggregations (ES weighted_avg /
top_metrics): local replay identity, sharded == single bit-identity,
zero-weight and both-fields rules, deterministic sort-cut semantics,
contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.metricsagg import (
    TOP_METRICS_COLUMNS,
    WEIGHTED_COLUMNS,
    derived_weighted,
    top_metrics_rows,
    top_metrics_search,
    weighted_avg_search,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]


def _fields(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    x = np.array([float(len(t)) for t in docs["text"]], dtype=np.float64)
    y = np.array(
        [float(len(tokenize(t))) for t in docs["text"]], dtype=np.float64
    )
    return ids, x, y


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


def _run_weighted(idx, cfg, docs, queries=QUERIES, sidecars=None):
    import pandas as pd

    if sidecars is None:
        ids, x, y = _fields(docs)
        sidecars = (ids, x, ids, y)
    df = weighted_avg_search(idx, _qds(queries), *sidecars, cfg).to_pandas()
    if not len(df):
        return pd.DataFrame(columns=WEIGHTED_COLUMNS)
    return df.sort_values("query_id").reset_index(drop=True)


def _run_top(idx, cfg, docs, size=3, queries=QUERIES, sidecars=None):
    import pandas as pd

    if sidecars is None:
        ids, x, y = _fields(docs)
        sidecars = (ids, x, ids, y)
    df = top_metrics_search(
        idx, _qds(queries), *sidecars, size=size, cfg=cfg
    ).to_pandas()
    if not len(df):
        return pd.DataFrame(columns=TOP_METRICS_COLUMNS)
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_weighted_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    got = _run_weighted(idx, cfg, docs)
    xmap = dict(zip(ids.tolist(), x.tolist()))
    ymap = dict(zip(ids.tolist(), y.tolist()))
    assert len(got) == len(QUERIES)
    diverged = []
    for qid, qtext in QUERIES:
        sel = sorted(_match_ids(docs, qtext))
        xv = np.array([xmap[d] for d in sel])
        wv = np.array([ymap[d] for d in sel])
        row = got[got["query_id"] == qid].iloc[0]
        assert int(row["n_docs"]) == len(sel)
        assert row["sum_w"] == float(np.sum(wv))
        assert row["sum_vw"] == float(np.sum(xv * wv))
        assert row["weighted_avg"] == derived_weighted(
            float(np.sum(wv)), float(np.sum(xv * wv))
        )
        diverged.append(row["weighted_avg"] != float(np.mean(xv)))
    # the weighting is non-vacuous: weighted != plain mean somewhere
    assert any(diverged)


def test_weighted_sharded_equals_single(tiny_index):
    from mini_ivf_ray.pipelines.matrix import join_xy
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    single = _run_weighted(idx, cfg, docs)
    jids, jx, jy = join_xy(ids, x, ids, y)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_xy_sidecar"):
            sharded.weighted_avg(QUERIES)
        sharded.attach_xy_sidecar(jids, jx, jy)
        got = sharded.weighted_avg(QUERIES).reset_index(drop=True)
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    assert list(got["query_id"]) == list(single["query_id"])
    for c in WEIGHTED_COLUMNS[1:]:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c


def test_weighted_zero_weight_and_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    ids, x, _ = _fields(docs)
    # all-zero weights: sum_w == 0 -> NO row (the ES-null analog)
    got = _run_weighted(
        idx, cfg, docs, sidecars=(ids, x, ids, np.zeros(ids.size))
    )
    assert len(got) == 0
    # negative weights refused loudly at the driver
    bad = np.ones(ids.size)
    bad[3] = -1.0
    with pytest.raises(ValueError, match="negative weight"):
        weighted_avg_search(idx, _qds(), ids, x, ids, bad, cfg)
    # weight-1 degenerates to the plain mean exactly
    ones = np.ones(ids.size)
    got = _run_weighted(idx, cfg, docs, sidecars=(ids, x, ids, ones))
    xmap = dict(zip(ids.tolist(), x.tolist()))
    for qid, qtext in QUERIES:
        sel = sorted(_match_ids(docs, qtext))
        xv = np.array([xmap[d] for d in sel])
        row = got[got["query_id"] == qid].iloc[0]
        assert row["weighted_avg"] == float(np.sum(xv)) / len(sel)


def test_top_metrics_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    got = _run_top(idx, cfg, docs, size=3)
    xmap = dict(zip(ids.tolist(), x.tolist()))
    ymap = dict(zip(ids.tolist(), y.tolist()))
    for qid, qtext in QUERIES:
        sel = sorted(_match_ids(docs, qtext))
        want = sorted(sel, key=lambda d: (-xmap[d], d))[:3]
        g = got[got["query_id"] == qid]
        assert list(g["doc_id"]) == want
        assert list(g["rank"]) == list(range(1, len(want) + 1))
        assert list(g["sort_v"]) == [xmap[d] for d in want]
        assert list(g["metric_v"]) == [ymap[d] for d in want]


def test_top_metrics_sharded_equals_single(tiny_index):
    from mini_ivf_ray.pipelines.matrix import join_xy
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    single = _run_top(idx, cfg, docs, size=5)
    jids, jx, jy = join_xy(ids, x, ids, y)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_xy_sidecar"):
            sharded.top_metrics(QUERIES, size=5)
        sharded.attach_xy_sidecar(jids, jx, jy)
        got = (
            sharded.top_metrics(QUERIES, size=5)
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    for c in TOP_METRICS_COLUMNS:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c


def test_top_metrics_tiebreak_and_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    ids, _, y = _fields(docs)
    # constant sort field: the cut must fall back to doc_id ASC
    const = np.full(ids.size, 5.0)
    got = _run_top(idx, cfg, docs, size=4, sidecars=(ids, const, ids, y))
    for qid, qtext in QUERIES:
        sel = sorted(_match_ids(docs, qtext))[:4]
        g = got[got["query_id"] == qid]
        assert list(g["doc_id"]) == sel
    with pytest.raises(ValueError, match="size"):
        top_metrics_search(idx, _qds(), ids, const, ids, y, size=0, cfg=cfg)
    # OOV query: no rows
    got = _run_top(idx, cfg, docs, queries=[(9, "zzqq9999xx")])
    assert len(got) == 0


def test_top_metrics_rows_kernel():
    docs = np.array([10, 11, 12, 13], dtype=np.uint64)
    sv = np.array([5.0, 9.0, 5.0, 1.0])
    mv = np.array([1.0, 2.0, 3.0, 4.0])
    d, s, m = top_metrics_rows(docs, sv, mv, 3)
    assert list(d) == [11, 10, 12]  # 9 first, then the 5-tie by doc asc
    assert list(s) == [9.0, 5.0, 5.0]
    assert list(m) == [2.0, 1.0, 3.0]
