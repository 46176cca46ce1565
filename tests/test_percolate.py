"""Percolation: conjunctive semantics vs a local replay."""

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.percolate import percolate


def _local(docs, stored):
    out = set()
    for _, r in docs.iterrows():
        toks = set(tokenize(r["text"]))
        for qid, text in stored:
            qt = set(tokenize(text))
            if qt and qt <= toks:
                out.add((int(np.uint64(r["doc_id"])), qid))
    return out


def test_percolate_matches_local(tiny_index):
    idx, cfg, docs = tiny_index
    stored = [
        (0, "the data"),
        (1, "w00042"),
        (2, "the of a in"),
        (3, "zz9999qq data"),
        (4, ""),
    ]
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(5)
    res = percolate(ds, stored)
    got = {
        (int(d), int(q))
        for d, q in zip(
            res["doc_id"].to_numpy().astype(np.uint64), res["query_id"]
        )
    }
    assert got == _local(docs, stored)
    # the OOV-conjunct query and the empty query match nothing
    assert not any(q in (3, 4) for _, q in got)


def test_no_queries_is_empty(tiny_index):
    idx, cfg, docs = tiny_index
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    assert len(percolate(ds, [])) == 0
    assert len(percolate(ds, [(9, "")])) == 0
