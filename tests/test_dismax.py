"""Disjunction-max retrieval: local replay identity, tie=1 == plain
BM25, tie=0 == pure max, non-vacuity (dis-max provably reorders),
contract validation."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.dismax import dismax_combine, dismax_search
from mini_ivf_ray.pipelines.query import brute_force_topk
from mini_ivf_ray.state.stats import CorpusStats


def _run(idx, cfg, queries, tie):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return dismax_search(idx, qds, cfg, tie_breaker=tie).to_pandas()


def _local_dismax(docs, idx, cfg, qtext, tie):
    """Brute-force per-term scores over the prepared docs, combined
    max + tie * (sum - max) — independent of the engine kernels."""
    stats = CorpusStats.load(idx)
    terms = sorted(set(tokenize(qtext)))
    toks = [tokenize(t) for t in docs["text"]]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    per_doc: dict[int, list[float]] = {}
    for t in terms:
        if stats.df.get(t, 0) <= 0:
            continue
        idf = bm25.idf(stats.df[t], stats.n_docs)
        for i, tk in enumerate(toks):
            tf = float(tk.count(t))
            if tf > 0:
                s = idf * float(
                    bm25.tf_norm(
                        np.array([tf]), np.array([dls[i]]),
                        stats.avgdl, cfg.k1, cfg.b,
                    )[0]
                )
                per_doc.setdefault(int(ids[i]), []).append(s)
    scored = [
        (max(ss) + tie * (sum(ss) - max(ss)), d) for d, ss in per_doc.items()
    ]
    out = sorted(scored, key=lambda t: (-t[0], t[1]))[: cfg.topk]
    return [(d, s) for s, d in out]


def test_dismax_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    for tie in (0.0, 0.3):
        for qid, text in enumerate(["the data web", "data fast slow the"]):
            res = (
                _run(idx, cfg, [(qid, text)], tie)
                .sort_values("rank")
                .reset_index(drop=True)
            )
            want = _local_dismax(docs, idx, cfg, text, tie)
            assert list(res["doc_id"].to_numpy().astype(np.uint64)) == [
                d for d, _ in want
            ]
            np.testing.assert_allclose(
                res["score"].to_numpy(), [s for _, s in want], rtol=1e-12
            )


def test_tie_one_equals_plain_bm25(tiny_index):
    idx, cfg, docs = tiny_index
    text = "the data web"
    res = _run(idx, cfg, [(0, text)], 1.0).sort_values("rank")
    oracle = brute_force_topk(docs, [(0, text)], cfg).sort_values("rank")
    assert list(res["doc_id"].to_numpy().astype(np.uint64)) == list(
        oracle["doc_id"].to_numpy().astype(np.uint64)
    )
    # max + 1.0*(sum-max) == sum up to one add/sub round-trip of the
    # max term; with exact float64 this is bit-identical because
    # (mx + (sums - mx)) recovers sums only approximately — so allow
    # the 1-ulp neighborhood instead of exact equality
    np.testing.assert_allclose(
        res["score"].to_numpy(), oracle["score"].to_numpy(), rtol=1e-15
    )


def test_dismax_reorders_vs_sum():
    # doc A: one strong term; docs B: two weak terms each summing higher
    # -> plain BM25 ranks B first, dis-max(tie=0) ranks A first
    per_term = [
        (np.array([1], dtype=np.uint64), np.array([5.0])),
        (np.array([2], dtype=np.uint64), np.array([3.0])),
        (np.array([2], dtype=np.uint64), np.array([3.0])),
    ]
    mx = dismax_combine(per_term, 0.0, 10)
    assert [d for d, _ in mx] == [1, 2]
    assert [s for _, s in mx] == [5.0, 3.0]
    sm = dismax_combine(per_term, 1.0, 10)
    assert [d for d, _ in sm] == [2, 1]
    assert [s for _, s in sm] == [6.0, 5.0]


def test_dismax_contracts(tiny_index):
    idx, cfg, _ = tiny_index
    from mini_ivf_ray.pipelines.dismax import DisMaxSearcher

    with pytest.raises(ValueError):
        DisMaxSearcher(idx, cfg, tie_breaker=1.5)
    with pytest.raises(ValueError):
        DisMaxSearcher(idx, cfg, tie_breaker=-0.1)
    # OOV-only query -> empty result, no error
    res = _run(idx, cfg, [(0, "zzznope qqqmissing")], 0.3)
    assert len(res) == 0
