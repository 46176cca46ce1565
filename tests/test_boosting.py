"""Boosting query (ES boosting / Lucene BoostingQuery): local replay
identity, the two degenerate pins (OOV negative == plain BM25
bit-identically; negative == positive preserves order while scaling
every score by exactly negative_boost), match-set invariance (the
negative query demotes, never filters), and contracts."""

import dataclasses

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.boosting import boosting_search
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.state.stats import CorpusStats


def _plain_bm25(docs, idx, qtext):
    """(doc_id -> full BM25 sum) over every matching doc."""
    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per = []
    for t in sorted(set(tokenize(qtext))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        per.append(
            (
                ids[order][m[order]],
                bm25.contributions(
                    tf[order][m[order]], dl[order][m[order]],
                    stats.df[t], stats.n_docs, stats.avgdl,
                ),
            )
        )
    if not per:
        return {}
    dc = np.concatenate([d for d, _ in per])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size)
    np.add.at(scores, inv, np.concatenate([c for _, c in per]))
    return dict(zip(uniq.tolist(), scores.tolist()))


def _neg_docs(docs, qtext):
    terms = set(tokenize(qtext))
    out = set()
    for d, t in zip(docs["doc_id"], docs["text"]):
        if terms & set(tokenize(t)):
            out.add(int(d))
    return out


def _run(idx, cfg, queries):
    qds = ray.data.from_items(
        [
            {
                "query_id": q,
                "positive": p,
                "negative": n,
                "negative_boost": nb,
            }
            for q, p, n, nb in queries
        ]
    )
    return boosting_search(idx, qds, cfg).to_pandas()


def test_boosting_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [
        (0, "the data web", "w00042", 0.5),
        (1, "a data", "web the", 0.25),
        (2, "w00042 of", "data", 0.0),  # nb=0 floors demoted to 0.0
    ]
    res = _run(idx, cfg, queries)
    assert len(res)
    for qid, pos, neg, nb in queries:
        plain = _plain_bm25(docs, idx, pos)
        nd = _neg_docs(docs, neg)
        want = sorted(
            ((s * (nb if d in nd else 1.0), d) for d, s in plain.items()),
            key=lambda t: (-t[0], t[1]),
        )[: cfg.topk]
        g = res[res["query_id"] == qid].sort_values("rank")
        got = list(zip(g["score"], g["doc_id"].to_numpy().astype(np.uint64)))
        assert [d for _, d in got] == [d for _, d in want], qid
        assert [s for s, _ in got] == pytest.approx(
            [s for s, _ in want], rel=0, abs=0
        ), qid
    # non-vacuity: demotion actually reordered query 0 vs plain BM25
    qds = ray.data.from_items([{"query_id": 0, "text": "the data web"}])
    plain_ranked = (
        search(idx, qds, cfg).to_pandas().sort_values("rank")
    )
    got0 = res[res["query_id"] == 0].sort_values("rank")
    assert list(got0["doc_id"]) != list(plain_ranked["doc_id"])


def test_boosting_degenerate_pins(tiny_index):
    idx, cfg, docs = tiny_index
    pos = "the data web"
    # OOV negative: bit-identical to plain BM25 (scores AND order)
    res = _run(idx, cfg, [(0, pos, "zzqq9999xx", 0.5)])
    qds = ray.data.from_items([{"query_id": 0, "text": pos}])
    plain = search(idx, qds, cfg).to_pandas().sort_values("rank")
    got = res.sort_values("rank")
    assert list(got["doc_id"].astype("uint64")) == list(
        plain["doc_id"].astype("uint64")
    )
    assert np.array_equal(got["score"].to_numpy(), plain["score"].to_numpy())
    # negative == positive: order preserved, every score scaled by nb
    nb = 0.125  # power of two: the multiply is exact in float64
    res2 = _run(idx, cfg, [(0, pos, pos, nb)]).sort_values("rank")
    assert list(res2["doc_id"].astype("uint64")) == list(
        plain["doc_id"].astype("uint64")
    )
    assert np.array_equal(
        res2["score"].to_numpy(), plain["score"].to_numpy() * nb
    )


def test_boosting_never_filters(tiny_index):
    """The negative query demotes but cannot shrink the match set:
    at wide topk the doc set equals plain BM25's match set exactly."""
    idx, cfg, docs = tiny_index
    wide = dataclasses.replace(cfg, topk=len(docs) + 10)
    pos, neg = "the data", "web"
    res = _run(idx, wide, [(0, pos, neg, 0.5)])
    qds = ray.data.from_items([{"query_id": 0, "text": pos}])
    plain = search(idx, qds, wide).to_pandas()
    assert set(res["doc_id"].astype("uint64")) == set(
        plain["doc_id"].astype("uint64")
    )
    # and the demoted subset is exactly the negative match set
    # intersected with the positive one
    nd = _neg_docs(docs, neg)
    merged = res.merge(
        plain[["doc_id", "score"]], on="doc_id", suffixes=("", "_plain")
    )
    demoted = set(
        merged.loc[
            merged["score"] != merged["score_plain"], "doc_id"
        ].astype("uint64")
    )
    want = {int(d) for d in plain["doc_id"].astype("uint64") if int(d) in nd}
    assert demoted == want and demoted  # non-vacuous


def test_boosting_contracts(tiny_index):
    idx, cfg, _docs = tiny_index
    with pytest.raises(Exception, match=r"negative_boost"):
        _run(idx, cfg, [(0, "the data", "web", 1.5)])
    with pytest.raises(Exception, match=r"negative_boost"):
        _run(idx, cfg, [(0, "the data", "web", -0.1)])
    # OOV positive: zero rows, no error
    res = _run(idx, cfg, [(0, "zzqq9999xx", "web", 0.5)])
    assert len(res) == 0
