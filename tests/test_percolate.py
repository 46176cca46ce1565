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


def test_phrase_percolation_order_and_degeneracies(ray_session):
    """percolate_phrases: contiguity + order pinned against a brute
    scan; single-token phrase == term percolation; empty rule inert."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.percolate import (
        percolate,
        percolate_phrases,
    )

    texts = [
        "alpha beta gamma",
        "beta alpha",
        "alpha beta",
        "gamma alpha beta gamma",
        "alpha gamma beta",   # contains all terms, never contiguous pair
        "delta",
    ]
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    rules = [(0, "alpha beta"), (1, "beta alpha"), (2, "gamma"), (3, "  ")]
    got = percolate_phrases(docs, rules)
    pairs = set(zip(got["doc_id"].astype(int), got["query_id"].astype(int)))
    # brute truth
    want = set()
    for i, t in enumerate(texts):
        tk = tokenize(t)
        for qid, rt in rules:
            rtk = tokenize(rt)
            if not rtk:
                continue
            k = len(rtk)
            if any(tk[j:j + k] == rtk for j in range(len(tk) - k + 1)):
                want.add((i, qid))
    assert pairs == want
    # order sensitivity: doc 2 matches rule 0 only; doc 1 rule 1 only
    assert (2, 0) in pairs and (2, 1) not in pairs
    assert (1, 1) in pairs and (1, 0) not in pairs
    # all-terms-but-not-contiguous doc is gated out by the verify
    assert (4, 0) not in pairs and (4, 1) not in pairs
    # single-token phrase == term percolation
    term_got = percolate(docs, [(2, "gamma")])
    t_pairs = set(
        zip(term_got["doc_id"].astype(int), term_got["query_id"].astype(int))
    )
    assert {p for p in pairs if p[1] == 2} == t_pairs
