"""Value-stats aggregations (ES exact cardinality / value_count /
missing): brute-force replay identity, doc-sharded bit-identity,
full/empty-sidecar degeneracies, null rejection, OOV emptiness."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.valuestats import value_stats_search

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "zzqq")]
COLS = ["n_matched", "value_count", "cardinality", "missing"]


def _qds():
    return ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )


def _partial_sidecar(docs):
    """Every 3rd doc (by position) lacks the field."""
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = np.array(
        [t.split()[0] for t in docs["text"]], dtype=object
    )  # first token as the keyword field
    keep = np.arange(ids.size) % 3 != 0
    return ids[keep], vals[keep]


def _brute(docs, queries, side_ids, side_vals):
    smap = dict(zip(map(int, side_ids), side_vals))
    toks = [set(tokenize(t)) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    rows = {}
    for qid, qtext in queries:
        terms = set(tokenize(qtext))
        matched = [int(ids[i]) for i, tk in enumerate(toks) if tk & terms]
        if not matched:
            continue
        vals = [smap[d] for d in matched if d in smap]
        rows[qid] = {
            "n_matched": len(matched),
            "value_count": len(vals),
            "cardinality": len(set(vals)),
            "missing": len(matched) - len(vals),
        }
    return rows


def test_value_stats_matches_brute(tiny_index):
    idx, cfg, docs = tiny_index
    side_ids, side_vals = _partial_sidecar(docs)
    got = (
        value_stats_search(idx, _qds(), side_ids, side_vals, cfg)
        .to_pandas()
        .sort_values("query_id")
    )
    exp = _brute(docs, QUERIES, side_ids, side_vals)
    assert set(got["query_id"]) == set(exp)
    assert 2 not in set(got["query_id"])  # OOV query: no row
    for _, r in got.iterrows():
        e = exp[int(r["query_id"])]
        for c in COLS:
            assert int(r[c]) == e[c], (int(r["query_id"]), c)
    # the partial sidecar is non-vacuous
    assert (got["missing"] > 0).any()
    assert (got["cardinality"] > 1).any()


def test_sharded_value_stats_identity(tiny_index):
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    side_ids, side_vals = _partial_sidecar(docs)
    single = (
        value_stats_search(idx, _qds(), side_ids, side_vals, cfg)
        .to_pandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        with pytest.raises(ValueError, match="attach_sidecar"):
            sharded.value_stats(QUERIES)
        sharded.attach_sidecar(side_ids, side_vals)
        got = (
            sharded.value_stats(QUERIES)
            .sort_values("query_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(single)
        for c in ["query_id"] + COLS:
            assert np.array_equal(
                got[c].to_numpy().astype(np.int64),
                single[c].to_numpy().astype(np.int64),
            ), c
    finally:
        sharded.shutdown()


def test_full_and_empty_sidecar_degeneracies(tiny_index):
    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = np.array([t.split()[0] for t in docs["text"]], dtype=object)
    full = (
        value_stats_search(idx, _qds(), ids, vals, cfg).to_pandas()
    )
    assert len(full) and (full["missing"] == 0).all()
    assert (full["value_count"] == full["n_matched"]).all()
    empty = value_stats_search(
        idx, _qds(), np.empty(0, np.uint64), np.empty(0, object), cfg
    ).to_pandas()
    assert len(empty) == len(full)
    assert (empty["value_count"] == 0).all()
    assert (empty["cardinality"] == 0).all()
    assert np.array_equal(
        empty["missing"].to_numpy(), empty["n_matched"].to_numpy()
    )
    assert np.array_equal(
        empty["n_matched"].to_numpy(), full["n_matched"].to_numpy()
    )


def test_null_sidecar_value_rejected(tiny_index):
    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)[:3]
    with pytest.raises(ValueError, match="null"):
        value_stats_search(
            idx, _qds(), ids, np.array(["a", None, "b"], dtype=object), cfg
        )
