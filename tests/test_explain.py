"""Explain API: explained top-k == query.search bit-identically,
per-doc rows sum to the exact score in term order, component values
match a local recompute, OOV/partial-match row shapes."""

import numpy as np

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.explain import explain_search
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.state.stats import CorpusStats

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data row")]


def _qds(queries):
    return ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )


def test_explained_topk_is_searchs_topk(tiny_index):
    idx, cfg, docs = tiny_index
    exp = explain_search(idx, _qds(QUERIES), cfg).to_pandas()
    plain = search(idx, _qds(QUERIES), cfg).to_pandas()
    got = (
        exp[["query_id", "rank", "doc_id", "score"]]
        .drop_duplicates()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        plain[["query_id", "rank", "doc_id", "score"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"].astype("uint64")) == list(
        want["doc_id"].astype("uint64")
    )
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_rows_sum_to_score_in_term_order(tiny_index):
    """Per (query, doc): left-to-right sum of the contrib rows in
    sorted-term order reproduces the total score BIT-exactly (the
    accumulation contract)."""
    idx, cfg, docs = tiny_index
    exp = explain_search(idx, _qds(QUERIES), cfg).to_pandas()
    assert len(exp)
    for (q, d), g in exp.groupby(["query_id", "doc_id"]):
        g = g.sort_values("term")
        total = np.float64(0.0)
        for c in g["contrib"]:
            total = total + np.float64(c)
        assert total == g["score"].iloc[0], (q, d)


def test_components_match_local_recompute(tiny_index):
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    toks = {
        int(i): tokenize(t) for i, t in zip(docs["doc_id"], docs["text"])
    }
    exp = explain_search(idx, _qds(QUERIES), cfg).to_pandas()
    for row in exp.itertuples():
        d = int(row.doc_id)
        tf = float(toks[d].count(row.term))
        dl = float(len(toks[d]))
        assert row.tf == tf
        assert row.df == float(stats.df[row.term])
        assert row.idf == bm25.idf(row.df, stats.n_docs)
        want = bm25.contributions(
            np.array([tf]), np.array([dl]),
            row.df, stats.n_docs, stats.avgdl, cfg.k1, cfg.b,
        )[0]
        assert row.contrib == want


def test_partial_match_and_oov_shapes(tiny_index):
    """A top doc missing a query term has no row for it; an OOV query
    yields zero rows."""
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    rare = sorted(
        t for t, d in stats.df.items() if 0 < d / stats.n_docs <= 0.02
    )[0]
    text = f"the {rare}"
    exp = explain_search(
        idx, _qds([(0, text)]), cfg
    ).to_pandas()
    assert len(exp)
    per_doc = exp.groupby("doc_id")["term"].apply(set)
    toks = {
        int(i): set(tokenize(t)) for i, t in zip(docs["doc_id"], docs["text"])
    }
    for d, ts in per_doc.items():
        assert ts == {w for w in ("the", rare) if w in toks[int(d)]}
    assert any(ts == {"the"} for ts in per_doc.tolist()), (
        "need a partial-match doc for non-vacuity"
    )
    assert explain_search(
        idx, _qds([(9, "zzzqqq")]), cfg
    ).count() == 0
