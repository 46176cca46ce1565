"""Common-terms query: local replay identity, degenerate ==-BM25 pins,
non-vacuity of the rare-term gate, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.commonterms import common_terms_search
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.state.stats import CorpusStats

CUTOFF = 0.10


def _local_common(docs, idx, qtext, k, cutoff=CUTOFF):
    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per, rare = [], []
    has_rare = False
    for t in sorted(set(tokenize(qtext))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        docs_t = ids[order][m[order]]
        c = bm25.contributions(
            tf[order][m[order]], dl[order][m[order]],
            stats.df[t], stats.n_docs, stats.avgdl,
        )
        per.append((docs_t, c))
        if np.float64(stats.df[t]) / np.float64(stats.n_docs) <= cutoff:
            has_rare = True
            rare.append(docs_t)
    if not per:
        return []
    dc = np.concatenate([d for d, _ in per])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size)
    np.add.at(scores, inv, np.concatenate([c for _, c in per]))
    if has_rare:
        qual = set(np.concatenate(rare).tolist())
        keep = np.array([d in qual for d in uniq.tolist()])
        uniq, scores = uniq[keep], scores[keep]
    out = sorted(zip(scores, uniq), key=lambda t: (-t[0], t[1]))[:k]
    return [(int(d), float(s)) for s, d in out]


def test_common_terms_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "the data web"), (1, "the w00042"), (2, "a of data")]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    res = common_terms_search(idx, qds, cfg).to_pandas()
    for qid, text in queries:
        want = _local_common(docs, idx, text, cfg.topk)
        g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(d), float(s))
            for d, s in zip(
                g["doc_id"].to_numpy().astype(np.uint64), g["score"]
            )
        ]
        assert got == want, qid


def test_gate_actually_bites_and_scores_are_bm25(tiny_index):
    """A mixed common+rare query: every hit contains a rare term, the
    plain-BM25 ranking over the same text differs (the common term
    alone would otherwise dominate), and surviving docs keep their
    EXACT plain-BM25 scores."""
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    n = stats.n_docs
    common = [t for t, d in stats.df.items() if d / n > CUTOFF]
    rare = [t for t, d in stats.df.items() if 0 < d / n <= 0.02]
    assert common and rare, "fixture must have both frequency classes"
    text = f"{common[0]} {sorted(rare)[0]}"
    qds = ray.data.from_items([{"query_id": 0, "text": text}])
    got = (
        common_terms_search(idx, qds, cfg)
        .to_pandas()
        .sort_values("rank")
    )
    plain = (
        search(idx, ray.data.from_items([{"query_id": 0, "text": text}]), cfg)
        .to_pandas()
        .sort_values("rank")
    )
    toks = {
        int(i): set(tokenize(t))
        for i, t in zip(docs["doc_id"], docs["text"])
    }
    rare_t = sorted(rare)[0]
    assert len(got), "gated query must still match"
    for d in got["doc_id"].astype("uint64"):
        assert rare_t in toks[int(d)]
    # the gate excluded common-only docs that plain BM25 ranks
    assert list(plain["doc_id"].astype("uint64")) != list(
        got["doc_id"].astype("uint64")
    )
    # surviving docs score exactly their plain-BM25 sums
    pmap = dict(
        zip(plain["doc_id"].astype("uint64"), plain["score"])
    )
    for d, s in zip(got["doc_id"].astype("uint64"), got["score"]):
        if int(d) in pmap:
            assert s == pmap[int(d)]


def test_degenerate_queries_equal_plain_bm25(tiny_index):
    """All-rare and all-common queries both degenerate to the plain
    disjunction, bit-identically."""
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    n = stats.n_docs
    common = sorted(t for t, d in stats.df.items() if d / n > CUTOFF)
    rare = sorted(t for t, d in stats.df.items() if 0 < d / n <= 0.02)
    for text in (" ".join(rare[:2]), " ".join(common[:2])):
        qds = ray.data.from_items([{"query_id": 0, "text": text}])
        a = (
            common_terms_search(idx, qds, cfg)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        b = (
            search(idx, ray.data.from_items(
                [{"query_id": 0, "text": text}]), cfg)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert list(a["doc_id"].astype("uint64")) == list(
            b["doc_id"].astype("uint64")
        ), text
        assert np.array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    qds = ray.data.from_items([{"query_id": 0, "text": "data"}])
    for bad in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="max_term_frequency"):
            common_terms_search(idx, qds, cfg, max_term_frequency=bad)
    oov = ray.data.from_items([{"query_id": 9, "text": "zzzqqq"}])
    assert common_terms_search(idx, oov, cfg).count() == 0
