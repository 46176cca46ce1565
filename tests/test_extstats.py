"""Extended stats aggregation (ES extended_stats): local replay
identity over an integer-valued field (exact float64 moments), sharded
== single-pass bit-identity, missing-field skip + empty-query row
omission, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.extstats import (
    STAT_COLUMNS,
    derived_stats,
    ext_stats_search,
    merge_moments,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]


def _field(docs):
    """Integer-valued field: character count per doc."""
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


def _local(docs, queries, ids, vals):
    vmap = dict(zip(ids.tolist(), vals.tolist()))
    rows = []
    for qid, qtext in queries:
        vs = sorted(
            vmap[d] for d in _match_ids(docs, qtext) if d in vmap
        )
        if not vs:
            continue
        n = len(vs)
        s = float(np.sum(np.array(vs)))
        ss = float(np.sum(np.array(vs) ** 2))
        avg, var, std = derived_stats(n, s, ss)
        rows.append((qid, n, min(vs), max(vs), s, ss, avg, var, std))
    import pandas as pd

    return pd.DataFrame(rows, columns=STAT_COLUMNS)


def _run(idx, cfg, docs, queries=QUERIES, ids=None, vals=None):
    if ids is None:
        ids, vals = _field(docs)
    import pandas as pd

    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    df = ext_stats_search(idx, qds, ids, vals, cfg).to_pandas()
    if not len(df):
        return pd.DataFrame(columns=STAT_COLUMNS)
    return df.sort_values("query_id").reset_index(drop=True)


def test_extstats_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    got = _run(idx, cfg, docs)
    want = _local(docs, QUERIES, ids, vals)
    assert len(got) == len(QUERIES)  # every query matches something
    assert list(got["query_id"]) == list(want["query_id"])
    for c in STAT_COLUMNS[1:]:
        # integer-valued field -> exact float64 moments -> the derived
        # stats are the identical op sequence: bit-equal, no tolerance
        assert np.array_equal(
            got[c].to_numpy(), want[c].to_numpy()
        ), c
    # the aggregation is non-trivial: variance > 0 somewhere
    assert (got["variance"] > 0).any()


def test_extstats_sharded_identity(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    single = _run(idx, cfg, docs)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_value_sidecar"):
            sharded.ext_stats(QUERIES)
        sharded.attach_value_sidecar(ids, vals)
        got = sharded.ext_stats(QUERIES).reset_index(drop=True)
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    assert list(got["query_id"]) == list(single["query_id"])
    for c in STAT_COLUMNS[1:]:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c
    # the shard split was real: >= 2 shards held sidecar rows
    lo, hi = int(ids.min()), int(ids.max())
    assert hi - lo > 2**62  # md5-hashed ids span the space


def test_extstats_missing_field_and_empty(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    # keep the field on only half the docs: matched docs missing the
    # field are skipped entirely (ES semantics)
    keep = np.arange(ids.size) % 2 == 0
    got = _run(idx, cfg, docs, ids=ids[keep], vals=vals[keep])
    full = _run(idx, cfg, docs)
    m0 = set(_match_ids(docs, QUERIES[0][1]))
    kept_ids = set(ids[keep].tolist())
    want_n = len(m0 & kept_ids)
    row = got[got["query_id"] == 0]
    assert int(row["n_docs"].iloc[0]) == want_n
    assert want_n < int(full[full["query_id"] == 0]["n_docs"].iloc[0])
    # OOV query: no row at all (SQL GROUP BY shape)
    oov = _run(idx, cfg, docs, queries=[(7, "zzqq9999xx")])
    assert len(oov) == 0


def test_extstats_merge_and_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    # merge_moments is associative & matches a one-shot computation
    parts = [
        (0, 2, 5.0, 13.0, 2.0, 3.0),
        (0, 1, 7.0, 49.0, 7.0, 7.0),
        (1, 1, 4.0, 16.0, 4.0, 4.0),
    ]
    m = merge_moments(parts)
    assert m[0] == (3, 12.0, 62.0, 2.0, 7.0)
    assert m[1] == (1, 4.0, 16.0, 4.0, 4.0)
    avg, var, std = derived_stats(*m[1][:3])
    assert (avg, var, std) == (4.0, 0.0, 0.0)  # n=1: cancellation guard
    with pytest.raises(Exception, match="NaN"):
        bad = vals.copy()
        bad[0] = np.nan
        _run(idx, cfg, docs, ids=ids, vals=bad)


# ---------------------------------------------------------------------------
# percentile_ranks (ES percentile_ranks — inverse quantiles, exact)
# ---------------------------------------------------------------------------


def test_percentile_ranks_matches_local_and_bounds(tiny_index):
    import pandas as pd
    import pytest as _pytest

    from mini_ivf_ray.pipelines.extstats import percentile_ranks_search

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    vmap = dict(zip(ids.tolist(), vals.tolist()))
    lo, mid, hi = (
        float(np.min(vals)) - 1.0,
        float(np.median(vals)),
        float(np.max(vals)),
    )
    thresholds = [lo, mid, hi]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    got = (
        percentile_ranks_search(idx, qds, ids, vals, thresholds, cfg)
        .to_pandas()
        .sort_values(["query_id", "value"])
        .reset_index(drop=True)
    )
    assert len(got) == len(QUERIES) * len(thresholds)
    for qid, qtext in QUERIES:
        vs = sorted(vmap[d] for d in _match_ids(docs, qtext) if d in vmap)
        n = float(len(vs))
        g = got[got["query_id"] == qid].sort_values("value")
        for t, pct in zip(g["value"], g["pct"]):
            want = 100.0 * sum(1 for v in vs if v <= t) / n
            assert pct == want, (qid, t)
    # bounds: below-min threshold -> 0 %, at-max threshold -> 100 %
    g0 = got[got["query_id"] == 0].sort_values("value")
    assert g0["pct"].iloc[0] == 0.0
    assert g0["pct"].iloc[-1] == 100.0
    # monotone in the threshold
    assert (np.diff(g0["pct"].to_numpy()) >= 0).all()
    # contracts: no thresholds / NaN threshold raise
    with _pytest.raises(Exception, match="threshold"):
        percentile_ranks_search(idx, qds, ids, vals, [], cfg).to_pandas()


# ---------------------------------------------------------------------------
# terms agg ordered by metric sub-agg (ES order: {"avg_v": "desc"})
# ---------------------------------------------------------------------------


def test_grouped_metric_top_matches_local(tiny_index):
    import pytest as _pytest

    from mini_ivf_ray.pipelines.extstats import grouped_metric_top

    idx, cfg, docs = tiny_index
    ids, vals = _field(docs)
    vmap = dict(zip(ids.tolist(), vals.tolist()))

    def label_of(doc_id):
        return ["red", "green", "blue", "teal"][int(doc_id) % 4]

    labels = [label_of(d) for d in docs["doc_id"]]
    lmap = dict(zip(ids.tolist(), labels))
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    nb = 2
    got = (
        grouped_metric_top(
            idx, qds, ids, labels, ids, vals, cfg, num_buckets=nb
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    assert len(got)
    for qid, qtext in QUERIES:
        groups: dict[str, list[float]] = {}
        for d in _match_ids(docs, qtext):
            if d in vmap:
                groups.setdefault(lmap[d], []).append(vmap[d])
        want = sorted(
            (
                (name, len(vs), float(np.sum(np.array(vs))) / len(vs))
                for name, vs in groups.items()
            ),
            key=lambda t: (-t[2], t[0]),
        )[:nb]
        g = got[got["query_id"] == qid]
        assert list(zip(g["facet"], g["n_docs"])) == [
            (n, c) for n, c, _ in want
        ], qid
        assert np.array_equal(
            g["avg_v"].to_numpy(), np.array([a for *_, a in want])
        ), qid
    # the bucket cut bites: 4 labels exist, only nb returned per query
    assert (got.groupby("query_id").size() <= nb).all()
    with _pytest.raises(Exception, match="num_buckets"):
        grouped_metric_top(
            idx, qds, ids, labels, ids, vals, cfg, num_buckets=0
        ).to_pandas()


def test_merge_moments_property_random_partitions():
    """Hypothesis: for integer-valued data, merging per-partition
    moments over ANY partitioning equals the one-shot moments exactly
    (the claim every sharded aggregation path rests on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=1, max_size=200,
        ),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        nparts=st.integers(min_value=1, max_value=7),
    )
    def check(vals, seed, nparts):
        v = np.array(vals, dtype=np.float64)
        rng = np.random.default_rng(seed)
        assign = rng.integers(0, nparts, v.size)
        parts = []
        for p in range(nparts):
            pv = v[assign == p]
            if not pv.size:
                continue
            parts.append(
                (0, int(pv.size), float(np.sum(pv)),
                 float(np.sum(pv * pv)), float(np.min(pv)),
                 float(np.max(pv)))
            )
        merged = merge_moments(parts)[0]
        want = (
            int(v.size), float(np.sum(v)), float(np.sum(v * v)),
            float(np.min(v)), float(np.max(v)),
        )
        assert merged == want  # bit-exact, any partitioning
        a1, v1, s1 = derived_stats(*merged[:3])
        a2, v2, s2 = derived_stats(*want[:3])
        assert (a1, v1, s1) == (a2, v2, s2)

    check()
