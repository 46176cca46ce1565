"""Terms-set query (ES terms_set, per-doc minimum_should_match):
local replay identity, constant-field == msm bit-identity,
missing-field exclusion, unsatisfiable-required emptiness, clamping."""

import numpy as np

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.termsset import terms_set_search
from tests.test_boosting import _plain_bm25


def _required(docs):
    """Deterministic per-doc required count in 1..3 (char-count mod)."""
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    req = np.array([1 + len(t) % 3 for t in docs["text"]], dtype=np.int64)
    return ids, req


def _run(idx, cfg, docs, queries, ids=None, req=None):
    if ids is None:
        ids, req = _required(docs)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return terms_set_search(idx, qds, ids, req, cfg).to_pandas()


def _local(docs, idx, qtext, k, reqmap):
    terms = sorted(set(tokenize(qtext)))
    toks = {int(d): set(tokenize(t)) for d, t in zip(docs["doc_id"], docs["text"])}
    # score over MATCHED terms only == the full disjunctive BM25 sum
    smap = _plain_bm25(docs, idx, qtext)
    rows = []
    for d, s in smap.items():
        cnt = sum(1 for t in terms if t in toks[d])
        r = reqmap.get(d)
        if r is None:
            continue
        if cnt >= max(int(r), 1):
            rows.append((s, d, cnt, max(int(r), 1)))
    rows.sort(key=lambda t: (-t[0], t[1]))
    return rows[:k]


def test_terms_set_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    ids, req = _required(docs)
    reqmap = dict(zip(ids.tolist(), req.tolist()))
    queries = [(0, "the data web"), (1, "a of data w00042"), (2, "w00100 web")]
    res = _run(idx, cfg, docs, queries)
    assert len(res)
    for qid, text in queries:
        want = _local(docs, idx, text, cfg.topk, reqmap)
        g = res[res["query_id"] == qid].sort_values("rank")
        got = list(
            zip(
                g["score"],
                g["doc_id"].to_numpy().astype(np.uint64),
                g["n_matched"],
                g["required"],
            )
        )
        assert [(d, c, r) for _, d, c, r in got] == [
            (d, c, r) for _, d, c, r in want
        ], qid
        assert np.array_equal(
            np.array([s for s, *_ in got]),
            np.array([s for s, *_ in want]),
        ), qid
    # the per-doc filter bit: some query kept docs with DIFFERENT
    # required values (otherwise this is just msm)
    assert res["required"].nunique() > 1


def test_terms_set_constant_field_equals_msm(tiny_index):
    from mini_ivf_ray.pipelines.msm import msm_search

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    for m in (1, 2):
        req = np.full(ids.size, m, dtype=np.int64)
        ts = _run(
            idx, cfg, docs, [(0, "the data web")], ids=ids, req=req
        ).sort_values("rank")
        qds = ray.data.from_items(
            [{"query_id": 0, "text": "the data web", "min_match": m}]
        )
        ms = msm_search(idx, qds, cfg).to_pandas().sort_values("rank")
        assert list(ts["doc_id"].astype("uint64")) == list(
            ms["doc_id"].astype("uint64")
        ), m
        assert np.array_equal(ts["score"].to_numpy(), ms["score"].to_numpy())
        assert list(ts["n_matched"]) == list(ms["n_matched"])


def test_terms_set_missing_field_and_unsatisfiable(tiny_index):
    idx, cfg, docs = tiny_index
    ids, req = _required(docs)
    # drop the field from half the docs: they can never match
    keep = np.arange(ids.size) % 2 == 0
    res = _run(idx, cfg, docs, [(0, "the data")], ids=ids[keep], req=req[keep])
    kept = set(ids[keep].tolist())
    assert len(res)
    assert all(int(d) in kept for d in res["doc_id"].astype("uint64"))
    # required > query term count: unsatisfiable -> empty
    big = np.full(ids.size, 99, dtype=np.int64)
    res2 = _run(idx, cfg, docs, [(0, "the data")], ids=ids, req=big)
    assert len(res2) == 0
    # required <= 0 clamps to 1: every candidate matches
    zero = np.zeros(ids.size, dtype=np.int64)
    res3 = _run(idx, cfg, docs, [(0, "the data")], ids=ids, req=zero)
    assert len(res3) and (res3["required"] == 1).all()


def test_terms_set_oov_and_empty(tiny_index):
    idx, cfg, docs = tiny_index
    assert len(_run(idx, cfg, docs, [(0, "zzqq9999xx")])) == 0
    assert len(_run(idx, cfg, docs, [(0, "")])) == 0
