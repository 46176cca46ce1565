"""Search-quality eval: metrics match a local replay; degenerate query."""

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.evaluation import eval_search_quality
from mini_ivf_ray.pipelines.query import brute_force_topk


def _local_metrics(docs, qid, text, run, k):
    qt = set(tokenize(text))
    rel = {}
    for _, r in docs.iterrows():
        c = len(set(tokenize(r["text"])) & qt)
        if c:
            rel[int(np.uint64(r["doc_id"]))] = c
    top_docs = run[run["query_id"] == qid].sort_values("rank")
    ids = top_docs["doc_id"].to_numpy().astype(np.uint64)[:k]
    rel_at = np.array([rel.get(int(d), 0) for d in ids], dtype=np.int64)
    disc = 1.0 / np.log2(np.arange(k) + 2.0)
    dcg = float(((np.power(2.0, rel_at) - 1.0) * disc[: rel_at.size]).sum())
    top = np.sort(np.array(list(rel.values()), dtype=np.int64))[::-1][:k]
    idcg = float(
        ((np.power(2.0, top.astype(np.float64)) - 1.0) * disc[: top.size]).sum()
    )
    ndcg = dcg / idcg if idcg > 0 else 0.0
    first = np.flatnonzero(rel_at > 0)
    mrr = 1.0 / (int(first[0]) + 1) if first.size else 0.0
    hits = int((rel_at > 0).sum())
    recall = hits / len(rel) if rel else 0.0
    return len(rel), hits, ndcg, mrr, recall


def test_eval_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "the data"), (1, "w00011 w00012 w00013")]
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(6)
    res = eval_search_quality(idx, ds, queries, cfg, k=10)
    run = brute_force_topk(docs, queries, cfg)
    for qid, text in queries:
        n_rel, hits, ndcg, mrr, recall = _local_metrics(
            docs, qid, text, run, 10
        )
        row = res[res["query_id"] == qid].iloc[0]
        assert int(row["n_rel"]) == n_rel
        assert int(row["hits"]) == hits
        assert row["ndcg"] == ndcg
        assert row["mrr"] == mrr
        assert row["recall"] == recall


def test_eval_oov_query_is_zero(tiny_index):
    idx, cfg, docs = tiny_index
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = eval_search_quality(idx, ds, [(7, "zz9999qq")], cfg, k=10)
    row = res.iloc[0]
    assert int(row["n_rel"]) == 0 and int(row["hits"]) == 0
    assert row["ndcg"] == 0.0 and row["mrr"] == 0.0 and row["recall"] == 0.0


def test_k_beyond_cfg_topk_widens_the_run(tiny_index):
    """metrics@k with k > cfg.topk must evaluate a k-deep run, not a
    silently truncated cfg.topk-deep one."""
    idx, cfg, docs = tiny_index
    queries = [(0, "the data")]
    ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res20 = eval_search_quality(idx, ds, queries, cfg, k=20)
    run = brute_force_topk(docs, queries, cfg)  # only for qrels below
    n_rel, hits10, *_ = _local_metrics(docs, 0, "the data", run, 10)
    row = res20.iloc[0]
    # 'the data' matches far more than 20 docs here, so a 20-deep run
    # must report exactly 20 hits (every retrieved doc is relevant)
    assert int(row["hits"]) == 20
    assert int(row["n_rel"]) == n_rel
    assert row["recall"] == 20 / n_rel


def test_err_matches_closed_form(tiny_index):
    """ERR replay: the engine's eval_err equals a direct cascade
    computation over brute-graded runs; perfect-single-relevant and
    all-irrelevant degenerate pins."""
    import numpy as np
    import pytest

    import ray.data
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.evaluation import eval_err
    from mini_ivf_ray.pipelines.query import search

    idx, cfg, docs = tiny_index
    queries = [(0, "the data web"), (1, "w00042 of"), (2, "zzqq")]
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    got = eval_err(idx, docs_ds, queries, cfg, k=10).set_index("query_id")
    # brute replay
    toks = [set(tokenize(t)) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    run = search(idx, qds, cfg).to_pandas()
    for qid, qtext in queries:
        terms = set(tokenize(qtext))
        grades = {
            int(d): len(ts & terms)
            for d, ts in zip(ids, toks)
            if ts & terms
        }
        gmax = max(grades.values()) if grades else 0
        assert int(got.loc[qid, "g_max"]) == gmax
        g = run[run["query_id"] == qid].sort_values("rank")
        if gmax == 0:
            assert got.loc[qid, "err"] == 0.0
            continue
        err, prior = 0.0, 1.0
        for r, d in enumerate(g["doc_id"]):
            rr = (2.0 ** grades.get(int(d), 0) - 1.0) / 2.0**gmax
            err += rr * prior / (r + 1.0)
            prior *= 1.0 - rr
        assert got.loc[qid, "err"] == pytest.approx(err, rel=0, abs=1e-12)
        # cascade bound: ERR <= 1, and > 0 when anything relevant ranked
        assert 0.0 < got.loc[qid, "err"] <= 1.0
