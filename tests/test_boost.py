"""Term boosting: parse rules, unit-boost identity, weighted replay."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.boost import boosted_search, parse_boosts
from mini_ivf_ray.pipelines.query import brute_force_topk
from mini_ivf_ray.state.stats import CorpusStats


def _run(idx, cfg, queries):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return boosted_search(idx, qds, cfg).to_pandas()


def test_parse_boosts():
    assert parse_boosts("data^2 web the^0.5") == {
        "data": 2.0,
        "web": 1.0,
        "the": 0.5,
    }
    assert parse_boosts("a^2 a") == {"a": 3.0}
    with pytest.raises(ValueError):
        parse_boosts("x^oops")
    # Lucene contract: non-positive boosts are rejected, not anti-scored
    with pytest.raises(ValueError):
        parse_boosts("x^-2")
    with pytest.raises(ValueError):
        parse_boosts("x^0")


def test_unit_boosts_equal_plain_bm25(tiny_index):
    idx, cfg, docs = tiny_index
    text = "the data web"
    res = _run(idx, cfg, [(0, text)]).sort_values("rank")
    oracle = brute_force_topk(docs, [(0, text)], cfg).sort_values("rank")
    assert list(res["doc_id"].to_numpy().astype(np.uint64)) == list(
        oracle["doc_id"].to_numpy().astype(np.uint64)
    )
    assert list(res["score"]) == list(oracle["score"])


def _local_boosted(docs, idx, cfg, qtext):
    stats = CorpusStats.load(idx)
    boosts = parse_boosts(qtext)
    toks = [tokenize(t) for t in docs["text"]]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per_term = []
    for t in sorted(boosts):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        m = tf > 0
        idf = bm25.idf(stats.df[t], stats.n_docs)
        c = idf * bm25.tf_norm(
            tf[order][m[order]], dls[order][m[order]],
            stats.avgdl, cfg.k1, cfg.b,
        )
        per_term.append((ids[order][m[order]], boosts[t] * c))
    dc = np.concatenate([d for d, _ in per_term])
    cc = np.concatenate([c for _, c in per_term])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, cc)
    out = sorted(zip(scores, uniq), key=lambda t: (-t[0], t[1]))[: cfg.topk]
    return [(int(d), float(s)) for s, d in out]


def test_boosted_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    text = "data^3 web^0.25 the"
    res = _run(idx, cfg, [(0, text)]).sort_values("rank")
    want = _local_boosted(docs, idx, cfg, text)
    got = [
        (int(d), float(s))
        for d, s in zip(res["doc_id"].to_numpy().astype(np.uint64), res["score"])
    ]
    assert got == want
