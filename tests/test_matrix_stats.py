"""Matrix stats aggregation (ES matrix_stats): local replay identity
over integer-valued fields (exact float64 co-moments), sharded ==
single-pass bit-identity, both-fields contribution rule, zero-variance
corr rule, merge/associativity + random-partition exactness,
contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.matrix import (
    MATRIX_COLUMNS,
    co_moments,
    derived_matrix,
    join_xy,
    matrix_stats_search,
    merge_comoments,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]


def _fields(docs):
    """Two integer-valued fields: x = char count, y = token count."""
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


def _local(docs, queries, ids, x, y):
    xmap = dict(zip(ids.tolist(), x.tolist()))
    ymap = dict(zip(ids.tolist(), y.tolist()))
    rows = []
    for qid, qtext in queries:
        sel = sorted(
            d for d in _match_ids(docs, qtext) if d in xmap and d in ymap
        )
        if not sel:
            continue
        xv = np.array([xmap[d] for d in sel], dtype=np.float64)
        yv = np.array([ymap[d] for d in sel], dtype=np.float64)
        m = co_moments(xv, yv)
        rows.append((qid, m[0], *derived_matrix(*m)))
    import pandas as pd

    return pd.DataFrame(rows, columns=MATRIX_COLUMNS)


def _run(idx, cfg, docs, queries=QUERIES, sidecars=None):
    import pandas as pd

    if sidecars is None:
        ids, x, y = _fields(docs)
        sidecars = (ids, x, ids, y)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    df = matrix_stats_search(idx, qds, *sidecars, cfg).to_pandas()
    if not len(df):
        return pd.DataFrame(columns=MATRIX_COLUMNS)
    return df.sort_values("query_id").reset_index(drop=True)


def test_matrix_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    got = _run(idx, cfg, docs)
    want = _local(docs, QUERIES, ids, x, y)
    assert len(got) == len(QUERIES)
    assert list(got["query_id"]) == list(want["query_id"])
    for c in MATRIX_COLUMNS[1:]:
        # integer-valued fields -> exact co-moments -> identical op
        # sequence both sides: bit-equal, no tolerance
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    # the statistic is non-trivial: chars and tokens genuinely
    # correlate in the synthetic corpus
    assert (got["corr_xy"] > 0.5).all()
    assert (got["var_x"] > 0).all() and (got["var_y"] > 0).all()


def test_matrix_sharded_identity(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    single = _run(idx, cfg, docs)
    jids, jx, jy = join_xy(ids, x, ids, y)
    sharded = ShardedIndex(idx, cfg, num_shards=4)
    try:
        with pytest.raises(ValueError, match="attach_xy_sidecar"):
            sharded.matrix_stats(QUERIES)
        sharded.attach_xy_sidecar(jids, jx, jy)
        got = sharded.matrix_stats(QUERIES).reset_index(drop=True)
    finally:
        sharded.shutdown()
    assert list(got.columns) == list(single.columns)
    assert list(got["query_id"]) == list(single["query_id"])
    for c in MATRIX_COLUMNS[1:]:
        assert np.array_equal(got[c].to_numpy(), single[c].to_numpy()), c


def test_matrix_both_fields_rule_and_empty(tiny_index):
    idx, cfg, docs = tiny_index
    ids, x, y = _fields(docs)
    # y on only half the docs: a matched doc missing EITHER field
    # contributes to nothing (not even n_docs)
    keep = np.arange(ids.size) % 2 == 0
    got = _run(idx, cfg, docs, sidecars=(ids, x, ids[keep], y[keep]))
    full = _run(idx, cfg, docs)
    m0 = _match_ids(docs, QUERIES[0][1])
    want_n = len(m0 & set(ids[keep].tolist()))
    assert int(got[got["query_id"] == 0]["n_docs"].iloc[0]) == want_n
    assert want_n < int(full[full["query_id"] == 0]["n_docs"].iloc[0])
    # OOV query: no row at all (SQL GROUP BY shape)
    oov = _run(idx, cfg, docs, queries=[(7, "zzqq9999xx")])
    assert len(oov) == 0


def test_matrix_zero_variance_corr_rule(tiny_index):
    idx, cfg, docs = tiny_index
    ids, x, _ = _fields(docs)
    # constant y: var_y == 0 -> corr defined as 0.0 (a constant field
    # correlates with nothing), cov == 0 exactly
    const = np.full(ids.size, 7.0)
    got = _run(idx, cfg, docs, sidecars=(ids, x, ids, const))
    assert (got["var_y"].to_numpy() == 0.0).all()
    assert (got["cov_xy"].to_numpy() == 0.0).all()
    assert (got["corr_xy"].to_numpy() == 0.0).all()
    assert (got["var_x"].to_numpy() > 0.0).all()


def test_matrix_merge_random_partitions(tiny_index):
    # merge_comoments over ANY partitioning == one-shot, bit-exactly,
    # for integer-valued data (the sharded-exactness claim)
    rng = np.random.default_rng(7)
    x = rng.integers(0, 500, size=400).astype(np.float64)
    y = rng.integers(0, 80, size=400).astype(np.float64)
    want = co_moments(x, y)
    for trial in range(20):
        cuts = np.sort(rng.integers(0, 400, size=rng.integers(1, 9)))
        parts = []
        prev = 0
        for c in list(cuts) + [400]:
            if c > prev:
                parts.append((0, *co_moments(x[prev:c], y[prev:c])))
                prev = c
        merged = merge_comoments(parts)[0]
        assert merged == want, trial
    assert derived_matrix(*want)[5] == pytest.approx(
        np.corrcoef(x, y)[0, 1], abs=1e-12
    )


def test_matrix_contracts():
    ids = np.array([3, 1, 2], dtype=np.uint64)
    # join_xy sorts, intersects, and rejects NaN / dup ids
    jids, jx, jy = join_xy(
        ids, [3.0, 1.0, 2.0], np.array([2, 4], dtype=np.uint64), [20.0, 40.0]
    )
    assert jids.tolist() == [2] and jx.tolist() == [2.0]
    assert jy.tolist() == [20.0]
    with pytest.raises(ValueError, match="NaN"):
        join_xy(ids, [1.0, np.nan, 2.0], ids, [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="duplicate"):
        join_xy(
            np.array([1, 1], dtype=np.uint64), [1.0, 2.0],
            np.array([1, 2], dtype=np.uint64), [1.0, 2.0],
        )
