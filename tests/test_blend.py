"""Static-score blending (BM25 + w * pagerank/scale): local replay
identity, the w=0 == plain-BM25 pin, zero-prior default for docs
absent from the sidecar, and that the prior provably reorders."""

import dataclasses

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.pipelines.blend import blended_search
from mini_ivf_ray.pipelines.query import brute_force_topk, search

QUERIES = [(0, "the data web"), (1, "w00042 w00100"), (2, "zz_oov_zz")]
SCALE = 10**12


def _static(docs, rng):
    ids = np.sort(docs["doc_id"].to_numpy().astype(np.uint64))
    ranks = rng.integers(0, SCALE, size=ids.size).astype(np.int64)
    return ids, ranks


def _local_blend(docs, queries, cfg, ids, ranks, w):
    wide = dataclasses.replace(cfg, topk=len(docs))
    full = brute_force_topk(docs, queries, wide)
    smap = dict(zip((int(i) for i in ids), (int(r) for r in ranks)))
    out = {}
    for qid, _ in queries:
        g = full[full["query_id"] == qid]
        d = g["doc_id"].to_numpy().astype(np.uint64)
        s = g["score"].to_numpy()
        st = np.array(
            [smap.get(int(x), 0) for x in d], dtype=np.float64
        )
        blended = s + np.float64(w) * (st / np.float64(SCALE))
        order = np.lexsort((d, -blended))
        out[qid] = [
            (int(d[i]), float(blended[i])) for i in order[: cfg.topk]
        ]
    return out


def test_blended_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(61)
    ids, ranks = _static(docs, rng)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    res = blended_search(idx, qds, ids, ranks, cfg, w=0.5).to_pandas()
    want = _local_blend(docs, QUERIES, cfg, ids, ranks, 0.5)
    for qid, _ in QUERIES:
        g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(d), float(s))
            for d, s in zip(
                g["doc_id"].to_numpy().astype(np.uint64), g["score"]
            )
        ]
        assert got == want[qid], qid
    # the prior provably reorders: blended top-1 differs from plain
    # bm25 top-1 for at least one query (otherwise the fixture is
    # vacuous for blending)
    plain = search(idx, qds, cfg).to_pandas()
    diffs = 0
    for qid, _ in QUERIES:
        a = res[(res["query_id"] == qid) & (res["rank"] == 0)]["doc_id"]
        b = plain[(plain["query_id"] == qid) & (plain["rank"] == 0)][
            "doc_id"
        ]
        if len(a) and len(b) and int(a.iloc[0]) != int(b.iloc[0]):
            diffs += 1
    assert diffs > 0


def test_blend_w0_equals_plain_bm25(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(67)
    ids, ranks = _static(docs, rng)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    blended = blended_search(idx, qds, ids, ranks, cfg, w=0.0).to_pandas()
    plain = search(idx, qds, cfg).to_pandas()
    for df in (blended, plain):
        df.sort_values(["query_id", "rank"], inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert list(blended["doc_id"].astype(np.uint64)) == list(
        plain["doc_id"].astype(np.uint64)
    )
    assert np.array_equal(
        blended["score"].to_numpy(), plain["score"].to_numpy()
    )


def test_blend_missing_sidecar_docs_default_zero(tiny_index):
    """Docs absent from the static sidecar blend with prior 0 — they
    keep their plain BM25 score instead of erroring or vanishing."""
    idx, cfg, docs = tiny_index
    ids = np.sort(docs["doc_id"].to_numpy().astype(np.uint64))[:3]
    ranks = np.full(3, SCALE, dtype=np.int64)
    qds = ray.data.from_items([{"query_id": 0, "text": "the"}])
    res = blended_search(idx, qds, ids, ranks, cfg, w=1.0).to_pandas()
    assert len(res)
    want = _local_blend(docs, [(0, "the")], cfg, ids, ranks, 1.0)
    got = [
        (int(d), float(s))
        for d, s in zip(
            res.sort_values("rank")["doc_id"].to_numpy().astype(np.uint64),
            res.sort_values("rank")["score"],
        )
    ]
    assert got == want[0]


def test_blend_empty_sidecar_is_plain_bm25(tiny_index):
    """Regression: an EMPTY static sidecar (e.g. the prior of an
    all-filtered graph) used to IndexError on the size-0 searchsorted
    gather; it must blend every doc with prior 0 == plain BM25."""
    idx, cfg, _docs = tiny_index
    qds = ray.data.from_items([{"query_id": 0, "text": "the data"}])
    res = blended_search(
        idx,
        qds,
        np.array([], dtype=np.uint64),
        np.array([], dtype=np.int64),
        cfg,
        w=1.0,
    ).to_pandas()
    plain = search(idx, qds, cfg).to_pandas()
    for df in (res, plain):
        df.sort_values("rank", inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert list(res["doc_id"].astype(np.uint64)) == list(
        plain["doc_id"].astype(np.uint64)
    )
    assert np.array_equal(res["score"].to_numpy(), plain["score"].to_numpy())
