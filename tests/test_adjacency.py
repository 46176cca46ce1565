"""Adjacency-matrix aggregation (ES adjacency_matrix): local replay
identity, the matmul == set-algebra pin, diagonal == facet-style
single-filter counts, intersection symmetry/subset laws, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.adjacency import (
    adjacency_search,
    bucket_rows,
    validate_filters,
)

FILTERS = [("d", "data"), ("w", "web"), ("t", "the")]


def _local(docs, qtext, filters):
    qterms = set(tokenize(qtext))
    toks = {
        int(d): set(tokenize(t))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    match = {d for d, tk in toks.items() if qterms & tk}
    sets = {
        name: {d for d in match if tokenize(text)[0] in toks[d]}
        for name, text in filters
    }
    rows = []
    names = [n for n, _ in filters]
    for n in names:
        if sets[n]:
            rows.append((n, len(sets[n])))
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            c = len(sets[a] & sets[b])
            if c:
                rows.append((f"{a}&{b}", c))
    return rows


def _run(idx, cfg, queries, filters=FILTERS):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return adjacency_search(idx, qds, filters, cfg).to_pandas()


def test_adjacency_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]
    res = _run(idx, cfg, queries)
    assert len(res)
    for qid, text in queries:
        want = _local(docs, text, FILTERS)
        g = res[res["query_id"] == qid]
        got = list(zip(g["key"], g["n_docs"]))
        assert got == want, qid
    # intersections exist and respect subset laws: |a&b| <= min(|a|,|b|)
    g0 = dict(
        zip(
            res[res["query_id"] == 0]["key"],
            res[res["query_id"] == 0]["n_docs"],
        )
    )
    assert "d&w" in g0 and g0["d&w"] <= min(g0["d"], g0["w"])
    assert g0["d&w"] > 0


def test_adjacency_diagonal_equals_facet_counts(tiny_index):
    """The diagonal buckets must equal per-filter match counts computed
    independently via the facet machinery's match sets."""
    from mini_ivf_ray.pipelines.facets import faceted_search

    idx, cfg, docs = tiny_index
    res = _run(idx, cfg, [(0, "the data web")])
    # single-filter counts from the local oracle of the OTHER module
    want = dict(_local(docs, "the data web", FILTERS))
    got = dict(zip(res["key"], res["n_docs"]))
    for name, _t in FILTERS:
        assert got.get(name) == want.get(name), name


def test_adjacency_matmul_kernel():
    """bucket_rows over a hand-built membership matrix reproduces the
    set algebra, omits zero buckets, and orders keys ES-style."""
    b = np.array(
        [
            [1, 1, 0, 0],
            [0, 1, 1, 0],
            [0, 0, 0, 0],  # empty filter: no diagonal row
        ],
        dtype=np.int64,
    )
    rows = bucket_rows(["a", "b", "c"], b @ b.T)
    assert rows == [("a", 2), ("b", 2), ("a&b", 1)]


def test_adjacency_contracts_and_oov(tiny_index):
    idx, cfg, _docs = tiny_index
    with pytest.raises(ValueError, match="unique"):
        validate_filters([("a", "data"), ("a", "web")])
    with pytest.raises(ValueError, match="'&'"):
        validate_filters([("a&b", "data")])
    with pytest.raises(ValueError, match="single term"):
        validate_filters([("a", "data web")])
    # OOV filter term: present in no bucket; OOV query: zero rows
    res = _run(
        idx, cfg, [(0, "the data")],
        filters=[("d", "data"), ("zz", "zzqq9999xx")],
    )
    assert set(res["key"]) == {"d"}
    assert len(_run(idx, cfg, [(0, "zzqq9999xx")])) == 0


def test_filters_agg_matches_local_replay(tiny_index):
    """filters agg: named counts + _other_ complement == brute local
    replay; all named buckets emitted even at 0."""
    from mini_ivf_ray.pipelines.adjacency import (
        OTHER_BUCKET_KEY,
        filters_agg_search,
    )

    idx, cfg, docs = tiny_index
    filters = FILTERS + [("dead", "zz9999qq")]  # a filter matching nothing
    queries = [(0, "the data"), (1, "w00042")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    res = filters_agg_search(idx, qds, filters, cfg).to_pandas()
    toks = {
        int(d): set(tokenize(t))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    for qid, qtext in queries:
        qterms = set(tokenize(qtext))
        match = {d for d, tk in toks.items() if qterms & tk}
        want = {}
        covered = set()
        for name, text in filters:
            s = {d for d in match if tokenize(text)[0] in toks[d]}
            want[name] = len(s)
            covered |= s
        want[OTHER_BUCKET_KEY] = len(match - covered)
        g = res[res["query_id"] == qid]
        got = dict(zip(g["key"], (int(x) for x in g["n_docs"])))
        assert got == want, qid
        assert got["dead"] == 0  # zero bucket present
        # buckets partition nothing beyond the match set: named counts
        # can overlap, but other + union == |match|
        assert got[OTHER_BUCKET_KEY] <= len(match)


def test_filters_agg_additive_over_doc_splits(tiny_index):
    """The (k+1)-vector is additive across disjoint doc-id halves —
    the doc-sharding merge argument."""
    from mini_ivf_ray.pipelines.adjacency import (
        OTHER_BUCKET_KEY,
        FiltersAggSearcher,
    )

    idx, cfg, docs = tiny_index
    s = FiltersAggSearcher(idx, cfg, None, None, FILTERS)
    c_all = s.filters_counts_for_text("the data")
    docs_m = s.disjunctive_matches_for_text("the data")
    mid = docs_m[len(docs_m) // 2]
    # simulate two shards by tombstone-style masking
    import numpy as _np

    lo = docs_m[docs_m < mid]
    hi = docs_m[docs_m >= mid]

    def count_subset(sub):
        k = len(s.filters)
        counts = _np.zeros(k + 1, dtype=_np.int64)
        if sub.size:
            any_mask = _np.zeros(sub.size, dtype=bool)
            from mini_ivf_ray.pipelines.query import _allowed_mask

            for i, fd in enumerate(s.filter_docs):
                m = _allowed_mask(sub, fd)
                counts[i] = int(m.sum())
                any_mask |= m
            counts[k] = int(sub.size - any_mask.sum())
        return counts

    assert _np.array_equal(count_subset(lo) + count_subset(hi), c_all)


def test_sharded_filters_agg_identity(tiny_index):
    """ShardedIndex.filters_agg == the single-index filters agg
    bit-for-bit (3 shards), incl. zero buckets."""
    from mini_ivf_ray.pipelines.adjacency import filters_agg_search
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    filters = FILTERS + [("dead", "zz9999qq")]
    queries = [(0, "the data"), (1, "w00042")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    single = (
        filters_agg_search(idx, qds, filters, cfg)
        .to_pandas()
        .sort_values(["query_id", "key"])
        .reset_index(drop=True)
    )
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        got = (
            sharded.filters_agg(queries, filters)
            .sort_values(["query_id", "key"])
            .reset_index(drop=True)
        )
    finally:
        sharded.shutdown()
    assert len(got) == len(single) == len(queries) * (len(filters) + 1)
    assert got["key"].tolist() == single["key"].tolist()
    assert np.array_equal(
        got["n_docs"].to_numpy().astype(np.int64),
        single["n_docs"].to_numpy().astype(np.int64),
    )
