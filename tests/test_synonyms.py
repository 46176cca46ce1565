"""Synonym groups: degenerate identity, local replay, OOV members."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import brute_force_topk
from mini_ivf_ray.pipelines.synonyms import parse_groups, synonym_search
from mini_ivf_ray.state.stats import CorpusStats


def _run(idx, cfg, queries):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return synonym_search(idx, qds, cfg).to_pandas()


def _local_syn_topk(docs: pd.DataFrame, idx, cfg, qtext: str):
    """Driver-side replay with the engine's own formula/order."""
    stats = CorpusStats.load(idx)
    groups = parse_groups(qtext)
    toks = [tokenize(t) for t in docs["text"]]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    order = np.argsort(ids)
    per_group = []
    for g in groups:
        tf = np.zeros(len(toks), dtype=np.float64)
        for i, tk in enumerate(toks):
            tf[i] = sum(tk.count(m) for m in g)
        m = tf > 0
        if not m.any():
            continue
        uniq = ids[order][m[order]]
        gtf = tf[order][m[order]]
        dl_u = dls[order][m[order]]
        idf_g = bm25.idf(int(m.sum()), stats.n_docs)
        contribs = idf_g * bm25.tf_norm(gtf, dl_u, stats.avgdl, cfg.k1, cfg.b)
        per_group.append((uniq, contribs))
    if not per_group:
        return []
    docs_cat = np.concatenate([d for d, _ in per_group])
    con_cat = np.concatenate([c for _, c in per_group])
    final_docs, inv = np.unique(docs_cat, return_inverse=True)
    scores = np.zeros(final_docs.size, dtype=np.float64)
    np.add.at(scores, inv, con_cat)
    top = np.argsort(-scores, kind="stable")
    out = sorted(
        zip(scores, final_docs), key=lambda t: (-t[0], t[1])
    )[: cfg.topk]
    return [(int(d), float(s)) for s, d in out]


def test_single_member_groups_equal_plain_bm25(tiny_index):
    idx, cfg, docs = tiny_index
    text = "the data web"
    res = _run(idx, cfg, [(0, text)])
    oracle = brute_force_topk(docs, [(0, text)], cfg).sort_values("rank")
    g = res.sort_values("rank")
    assert list(g["doc_id"].to_numpy().astype(np.uint64)) == list(
        oracle["doc_id"].to_numpy().astype(np.uint64)
    )
    assert list(g["score"]) == list(oracle["score"])


def test_group_scoring_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    text = "data|web the|a time"
    res = _run(idx, cfg, [(0, text)]).sort_values("rank")
    want = _local_syn_topk(docs, idx, cfg, text)
    got = [
        (int(d), float(s))
        for d, s in zip(
            res["doc_id"].to_numpy().astype(np.uint64), res["score"]
        )
    ]
    assert got == want


def test_oov_member_is_transparent(tiny_index):
    idx, cfg, docs = tiny_index
    a = _run(idx, cfg, [(0, "data|zz9999qq web")]).sort_values("rank")
    b = _run(idx, cfg, [(0, "data web")]).sort_values("rank")
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score"]) == list(b["score"])


def test_all_oov_query_is_empty(tiny_index):
    idx, cfg, docs = tiny_index
    res = _run(idx, cfg, [(0, "zz9999qq|qq9999zz")])
    assert len(res) == 0


def test_group_beats_double_counting(tiny_index):
    """A doc with both variants must score via summed-tf saturation,
    which is <= the naive two-term disjunction score."""
    idx, cfg, docs = tiny_index
    syn = _run(idx, cfg, [(0, "the|a")])
    naive = brute_force_topk(docs, [(0, "the a")], cfg)
    if len(syn) and len(naive):
        m_syn = dict(
            zip(syn["doc_id"].to_numpy().astype(np.uint64), syn["score"])
        )
        m_nv = dict(
            zip(naive["doc_id"].to_numpy().astype(np.uint64), naive["score"])
        )
        both = set(m_syn) & set(m_nv)
        assert both
        for d in both:
            assert m_syn[d] <= m_nv[d] + 1e-12
