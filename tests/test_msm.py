"""Minimum-should-match retrieval: m=1 == disjunctive search, m=k ==
conjunctive search, arbitrary m == exhaustive local replay."""

import dataclasses

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.msm import msm_search
from mini_ivf_ray.pipelines.query import brute_force_topk, search


def _qds(rows):
    return ray.data.from_items(
        [{"query_id": q, "text": t, "min_match": m} for q, t, m in rows]
    )


def _canon(df, cols=("query_id", "rank", "doc_id", "score")):
    df = df.copy()
    df["doc_id"] = df["doc_id"].astype("uint64")
    return (
        df[list(cols)]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_msm1_equals_disjunctive(tiny_index):
    idx, cfg, docs = tiny_index
    texts = [(0, "the data web"), (1, "w00042 w00100 zzqq")]
    got = msm_search(
        idx, _qds([(q, t, 1) for q, t in texts]), cfg
    ).to_pandas()
    want = search(
        idx,
        ray.data.from_items(
            [{"query_id": q, "text": t} for q, t in texts]
        ),
        cfg,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_msm_k_equals_conjunctive(tiny_index):
    idx, cfg, docs = tiny_index
    texts = [(0, "the data"), (1, "data web index")]
    rows = [(q, t, len(set(tokenize(t)))) for q, t in texts]
    got = msm_search(idx, _qds(rows), cfg).to_pandas()
    want = search(
        idx,
        ray.data.from_items(
            [{"query_id": q, "text": t} for q, t in texts]
        ),
        cfg,
        mode="and",
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    # every conjunctive hit matched every term
    assert (got["n_matched"] == [len(set(tokenize(t))) for q, t in texts
                                 for _ in range(int((got["query_id"] == q).sum()))]).all()


def test_msm_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    rows = [(0, "the data web time", 2), (1, "the data web time", 3)]
    got = msm_search(idx, _qds(rows), cfg).to_pandas()
    wide = dataclasses.replace(cfg, topk=len(docs))
    full = brute_force_topk(docs, [(q, t) for q, t, _ in rows], wide)
    tok_by_doc = {
        int(d): set(tokenize(t))
        for d, t in zip(
            docs["doc_id"].to_numpy().astype(np.uint64), docs["text"]
        )
    }
    for qid, text, m in rows:
        terms = set(tokenize(text))
        g = full[full["query_id"] == qid].sort_values("rank")
        keep = [
            len(terms & tok_by_doc[int(d)]) >= m
            for d in g["doc_id"].to_numpy().astype(np.uint64)
        ]
        want = g[keep].head(cfg.topk)
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["doc_id"].to_numpy().astype(np.uint64)) == list(
            want["doc_id"].to_numpy().astype(np.uint64)
        )
        assert list(sub["score"]) == list(want["score"])
        assert (
            sub["n_matched"].to_numpy()
            == np.array(
                [
                    len(terms & tok_by_doc[int(d)])
                    for d in sub["doc_id"].to_numpy().astype(np.uint64)
                ]
            )
        ).all()


def test_msm_above_term_count_matches_nothing(tiny_index):
    idx, cfg, docs = tiny_index
    got = msm_search(idx, _qds([(0, "the data", 3)]), cfg).to_pandas()
    assert len(got) == 0
