"""Boxplot + MAD aggregation (ES boxplot / median_absolute_deviation,
exact): single-pass kernel vs numpy, sharded exact-selection ==
single bit-identity, the bisection kernel fuzzed against np.partition,
integer-contract and edge-case pins."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.robuststats import (
    BOX_COLUMNS,
    boxplot_row,
    boxplot_search,
    select_order_stats,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]


def _field(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    v = np.array([float(len(t)) for t in docs["text"]], dtype=np.float64)
    return ids, v


def _match_ids(docs, qtext):
    terms = set(tokenize(qtext))
    return {
        int(d)
        for d, t in zip(docs["doc_id"], docs["text"])
        if terms & set(tokenize(t))
    }


def _run(idx, cfg, docs, queries=QUERIES, sidecars=None):
    import pandas as pd

    if sidecars is None:
        ids, v = _field(docs)
        sidecars = (ids, v)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    df = boxplot_search(idx, qds, *sidecars, cfg).to_pandas()
    if not len(df):
        return pd.DataFrame(columns=BOX_COLUMNS)
    return df.sort_values("query_id").reset_index(drop=True)


def test_boxplot_row_matches_numpy():
    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 4, 7, 100, 101):
        v = rng.integers(0, 500, size=n).astype(np.float64)
        got = boxplot_row(v)
        med = np.quantile(v, 0.5)
        want = (
            n, float(v.min()),
            float(np.quantile(v, 0.25)), float(med),
            float(np.quantile(v, 0.75)), float(v.max()),
            float(np.quantile(np.abs(v - med), 0.5)),
        )
        assert got == want, n
    assert boxplot_row(np.empty(0)) is None


def test_boxplot_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, v = _field(docs)
    got = _run(idx, cfg, docs)
    vmap = dict(zip(ids.tolist(), v.tolist()))
    assert len(got) == len(QUERIES)
    for qid, qtext in QUERIES:
        sel = np.array(
            [vmap[d] for d in sorted(_match_ids(docs, qtext))]
        )
        want = boxplot_row(sel)
        row = got[got["query_id"] == qid].iloc[0]
        assert tuple(row[c] for c in BOX_COLUMNS[1:]) == want
        # MAD is non-vacuously robust: differs from std-style spread
        assert row["mad"] > 0.0


def test_boxplot_sharded_selection_equals_single(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, v = _field(docs)
    single = _run(idx, cfg, docs)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_value_sidecar"):
            sharded.boxplot(QUERIES)
        sharded.attach_value_sidecar(ids, v)
        got = sharded.boxplot(QUERIES).reset_index(drop=True)
        # integer contract: a fractional field is refused loudly
        sharded.attach_value_sidecar(ids, v + 0.5)
        with pytest.raises(ValueError, match="integer-valued"):
            sharded.boxplot(QUERIES)
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    for c in BOX_COLUMNS:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c


def test_select_order_stats_fuzzed_vs_sort():
    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(1, 60))
        v = rng.integers(-50, 200, size=n).astype(np.int64)
        ranks = sorted(set(rng.integers(0, n, size=4).tolist()))
        probes_seen = []

        def count_le(probes):
            probes_seen.append(sum(len(t) for t in probes.values()))
            return {
                qid: [int(np.sum(v <= t)) for t in ts]
                for qid, ts in probes.items()
            }

        sel = select_order_stats(
            count_le, {0: (int(v.min()), int(v.max()))}, {0: ranks}
        )
        vs = np.sort(v)
        for r in ranks:
            assert sel[0][r] == vs[r], (trial, r)
        # probe volume is logarithmic, never value-proportional
        assert sum(probes_seen) <= len(ranks) * (
            int(np.ceil(np.log2(max(int(v.max()) - int(v.min()), 1) + 1)))
            + 2
        )


def test_boxplot_edges(tiny_index):
    idx, cfg, docs = tiny_index
    ids, v = _field(docs)
    # single-doc match set: all quantiles equal the value, mad == 0
    one = np.array([ids[0]], dtype=np.uint64)
    got = _run(
        idx, cfg, docs,
        queries=[(5, " ".join(tokenize(docs["text"].iloc[0])[:1]))],
        sidecars=(one, v[:1]),
    )
    if len(got):  # the term matches other docs too, but sidecar has 1
        row = got.iloc[0]
        assert row["q1"] == row["q2"] == row["q3"] == v[0]
        assert row["mad"] == 0.0
        assert int(row["n_docs"]) == 1
    # OOV query: no row
    assert len(_run(idx, cfg, docs, queries=[(9, "zzqq9999xx")])) == 0
    # NaN sidecar refused
    bad = v.copy()
    bad[0] = np.nan
    qds = ray.data.from_items([{"query_id": 0, "text": "the"}])
    with pytest.raises(ValueError, match="NaN"):
        boxplot_search(idx, qds, ids, bad, cfg)
