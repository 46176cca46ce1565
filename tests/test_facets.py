"""Faceted search (pipelines/facets.py) vs driver-side ground truth."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.facets import faceted_search

QUERIES = [(0, "the data web"), (1, "w00042 w00100"), (2, "zz_oov_zz"), (3, "the")]


def _truth(docs: pd.DataFrame, facet_of) -> pd.DataFrame:
    rows = []
    toks = [set(tokenize(t)) for t in docs["text"]]
    for qid, qtext in QUERIES:
        terms = set(tokenize(qtext))
        counts: dict[str, int] = {}
        for did, ts in zip(docs["doc_id"], toks):
            if ts & terms:
                f = facet_of(did)
                counts[f] = counts.get(f, 0) + 1
        for f, n in counts.items():
            rows.append((qid, f, n))
    return (
        pd.DataFrame(rows, columns=["query_id", "facet", "n_docs"])
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )


def test_faceted_search_matches_bruteforce(tiny_index):
    idx, cfg, docs = tiny_index

    def facet_of(doc_id):
        return ["even", "odd", "prime?"][int(doc_id) % 3]

    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    got = (
        faceted_search(
            idx,
            qds,
            docs["doc_id"].to_numpy(),
            [facet_of(d) for d in docs["doc_id"]],
            cfg,
        )
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    expect = _truth(docs, facet_of)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # the OOV query contributes no rows at all
    assert not (got["query_id"] == 2).any()


def test_faceted_search_cold_path_identical(tiny_index):
    idx, cfg, docs = tiny_index
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    vals = np.where(docs["doc_id"].to_numpy() % 2 == 0, "a", "b").tolist()
    warm = (
        faceted_search(idx, qds, docs["doc_id"].to_numpy(), vals, cfg)
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    cold = (
        faceted_search(
            idx, qds, docs["doc_id"].to_numpy(), vals, cfg, share=False
        )
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(warm, cold)


def test_null_facet_values_rejected(tiny_index):
    import pytest

    import ray.data
    from mini_ivf_ray.pipelines.facets import faceted_search

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy()
    vals = [f"v{int(d) % 3}" for d in ids]
    vals[0] = None
    qds = ray.data.from_items([{"query_id": 0, "text": "the"}])
    with pytest.raises(ValueError, match="null"):
        faceted_search(idx, qds, ids, vals, cfg)


# ---------------------------------------------------------------------------
# sampler aggregation (ES sampler + terms sub-agg over the top-N scored)
# ---------------------------------------------------------------------------


def test_sampler_facets_matches_bruteforce_topn(tiny_index):
    import pytest

    from mini_ivf_ray.pipelines.facets import sampler_facets
    from mini_ivf_ray.pipelines.query import brute_force_topk

    idx, cfg, docs = tiny_index

    def facet_of(doc_id):
        return ["even", "odd", "prime?"][int(doc_id) % 3]

    ids = docs["doc_id"].to_numpy()
    labels = [facet_of(d) for d in docs["doc_id"]]
    queries = [(0, "the data web"), (1, "w00042 w00100")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    n = 7
    got = (
        sampler_facets(idx, qds, ids, labels, cfg, sample_size=n)
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    # ground truth: facet counts over the brute-force top-n docs
    import dataclasses

    wide = dataclasses.replace(cfg, topk=n)
    rows = []
    for qid, qtext in queries:
        top = brute_force_topk(docs, [(qid, qtext)], wide)
        counts: dict[str, int] = {}
        for d in top["doc_id"].to_numpy().astype(np.uint64):
            f = facet_of(int(d))
            counts[f] = counts.get(f, 0) + 1
        for f, c in sorted(counts.items()):
            rows.append((qid, f, c))
    want = pd.DataFrame(rows, columns=["query_id", "facet", "n_docs"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the sample bites: counts sum to exactly n (match sets are larger)
    assert got.groupby("query_id")["n_docs"].sum().eq(n).all()
    # full-facet comparison: sampler differs from the full panel
    full = (
        faceted_search(idx, qds, ids, labels, cfg)
        .to_pandas()
        .groupby("query_id")["n_docs"]
        .sum()
    )
    assert (full > n).all()
    # contracts
    with pytest.raises(Exception, match="sample_size"):
        sampler_facets(
            idx, qds, ids, labels, cfg, sample_size=0
        ).to_pandas()


# diversified sampler (ES diversified_sampler + terms sub-agg)


def test_diversified_sampler_matches_greedy_bruteforce(tiny_index):
    import pytest

    from mini_ivf_ray.pipelines.facets import diversified_sampler_facets
    from mini_ivf_ray.pipelines.query import brute_force_topk

    idx, cfg, docs = tiny_index

    def facet_of(doc_id):
        return ["even", "odd", "prime?"][int(doc_id) % 3]

    def group_of(doc_id):
        return f"g{int(doc_id) % 4}"

    ids = docs["doc_id"].to_numpy()
    labels = [facet_of(d) for d in docs["doc_id"]]
    groups = [group_of(d) for d in docs["doc_id"]]
    queries = [(0, "the data web"), (1, "w00042 w00100")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    n, max_per = 6, 2
    got = (
        diversified_sampler_facets(
            idx, qds, ids, labels, ids, groups, cfg,
            sample_size=n, max_per=max_per,
        )
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    # ground truth: the LITERAL greedy walk over the full score order
    import dataclasses

    wide = dataclasses.replace(cfg, topk=10_000)
    rows = []
    for qid, qtext in queries:
        top = brute_force_topk(docs, [(qid, qtext)], wide)
        admitted, seen = [], {}
        for d in top["doc_id"].to_numpy().astype(np.uint64):
            g = group_of(int(d))
            if seen.get(g, 0) >= max_per:
                continue
            seen[g] = seen.get(g, 0) + 1
            admitted.append(int(d))
            if len(admitted) == n:
                break
        counts: dict[str, int] = {}
        for d in admitted:
            f = facet_of(d)
            counts[f] = counts.get(f, 0) + 1
        for f, c in sorted(counts.items()):
            rows.append((qid, f, c))
    want = pd.DataFrame(rows, columns=["query_id", "facet", "n_docs"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # with 4 groups x max_per 2 >= n = 6, the SAMPLE cap binds; the
    # diversity cap provably bit (the plain top-6 has a group over cap)
    for qid, qtext in queries:
        top = brute_force_topk(
            docs, [(qid, qtext)], dataclasses.replace(cfg, topk=n)
        )
        gcounts: dict[str, int] = {}
        for d in top["doc_id"].to_numpy().astype(np.uint64):
            g = group_of(int(d))
            gcounts[g] = gcounts.get(g, 0) + 1
        if max(gcounts.values()) > max_per:
            break
    else:
        raise AssertionError("diversity never bit: workload too uniform")
    assert got.groupby("query_id")["n_docs"].sum().eq(n).all()


def test_diversified_sampler_missing_div_field_and_contracts(tiny_index):
    import pytest

    from mini_ivf_ray.pipelines.facets import diversified_sampler_facets

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy()
    labels = ["x"] * len(ids)
    queries = [(0, "the data web")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    # diversity sidecar covering only ONE doc: the sample can hold at
    # most that doc (missing-diversity docs are excluded)
    got = (
        diversified_sampler_facets(
            idx, qds, ids, labels, ids[:1], ["g0"], cfg,
            sample_size=10, max_per=3,
        )
        .to_pandas()
    )
    assert got["n_docs"].sum() <= 1
    with pytest.raises(Exception, match="max_per"):
        diversified_sampler_facets(
            idx, qds, ids, labels, ids, labels, cfg,
            sample_size=5, max_per=0,
        ).to_pandas()
    with pytest.raises(ValueError, match="null"):
        diversified_sampler_facets(
            idx, qds, ids, labels, ids, [None] * len(ids), cfg,
        )


def test_random_sampler_facets(tiny_index):
    """ES random_sampler agg: brute replay of the deterministic
    permille gate, scale-factor law, full-permille == faceted_search,
    contracts."""
    import pytest

    from mini_ivf_ray.pipelines.facets import (
        faceted_search,
        random_sampler_facets,
    )
    from mini_ivf_ray.pipelines.sampling import split_bucket

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    facet_of = dict(
        zip(map(int, ids), (docs["doc_id"] % 3).map(str))
    )
    vals = [facet_of[int(d)] for d in ids]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    permille = 400
    got = (
        random_sampler_facets(
            idx, qds, ids, vals, cfg, permille=permille, salt="rs-agg"
        )
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    # brute gate replay
    toks = [set(tokenize(t)) for t in docs["text"]]
    gate = dict(zip(map(int, ids), split_bucket(ids, "rs-agg") < permille))
    rows = {}
    for qid, qtext in QUERIES:
        terms = set(tokenize(qtext))
        for did, ts in zip(map(int, ids), toks):
            if ts & terms and gate[did]:
                rows[(qid, facet_of[did])] = rows.get(
                    (qid, facet_of[did]), 0
                ) + 1
    assert len(got) == len(rows) > 0
    for q, f, n, est in zip(
        got["query_id"], got["facet"], got["n_sampled"], got["n_est"]
    ):
        assert rows[(int(q), f)] == int(n)
        assert est == float(n) * (1000.0 / permille)
    # the gate bites: sampled counts strictly below the full panel sum
    full = faceted_search(idx, qds, ids, vals, cfg).to_pandas()
    assert got["n_sampled"].sum() < full["n_docs"].sum()
    # permille=1000 degenerates to the exact panel
    all_in = (
        random_sampler_facets(idx, qds, ids, vals, cfg, permille=1000)
        .to_pandas()
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    full = full.sort_values(["query_id", "facet"]).reset_index(drop=True)
    assert np.array_equal(
        all_in["n_sampled"].to_numpy(), full["n_docs"].to_numpy()
    )
    assert np.array_equal(
        all_in["n_est"].to_numpy(),
        full["n_docs"].to_numpy().astype(np.float64),
    )
    with pytest.raises(Exception, match="permille"):
        random_sampler_facets(
            idx, qds, ids, vals, cfg, permille=0
        ).to_pandas()
