"""Field collapsing: local replay identity, group uniqueness, scores."""

import dataclasses

import numpy as np

import ray.data
from mini_ivf_ray.pipelines.collapse import collapsed_search
from mini_ivf_ray.pipelines.query import brute_force_topk


def _groups(docs):
    """Deterministic synthetic group attribute: doc_id % 7."""
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    return ids, [f"g{int(d) % 7}" for d in ids]


def _run(idx, cfg, docs, queries):
    gids, gvals = _groups(docs)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return collapsed_search(idx, qds, gids, gvals, cfg).to_pandas()


def _local_collapse(docs, queries, cfg):
    wide = dataclasses.replace(cfg, topk=len(docs))
    full = brute_force_topk(docs, queries, wide)
    gids, gvals = _groups(docs)
    gmap = dict(zip((int(i) for i in gids), gvals))
    out = {}
    for qid, _ in queries:
        g = full[full["query_id"] == qid].sort_values("rank")
        seen, rows = set(), []
        for d, s in zip(g["doc_id"].to_numpy().astype(np.uint64), g["score"]):
            grp = gmap[int(d)]
            if grp in seen:
                continue
            seen.add(grp)
            rows.append((int(d), grp, float(s)))
            if len(rows) == cfg.topk:
                break
        out[qid] = rows
    return out


def test_collapse_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "the data web"), (1, "w00042 w00100"), (2, "zz9999qq")]
    res = _run(idx, cfg, docs, queries)
    want = _local_collapse(docs, queries, cfg)
    assert set(res["query_id"]) <= {0, 1}
    for qid, _ in queries:
        g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(d), str(gr), float(s))
            for d, gr, s in zip(
                g["doc_id"].to_numpy().astype(np.uint64), g["grp"], g["score"]
            )
        ]
        assert got == want[qid], qid


def test_each_group_appears_once(tiny_index):
    idx, cfg, docs = tiny_index
    res = _run(idx, cfg, docs, [(0, "the a of")])
    g = res[res["query_id"] == 0]
    assert len(g) == g["grp"].nunique()
    assert (g.sort_values("rank")["score"].diff().dropna() <= 1e-12).all()


def test_null_group_values_rejected(tiny_index):
    import pytest

    idx, cfg, docs = tiny_index
    gids, gvals = _groups(docs)
    gvals = list(gvals)
    gvals[3] = None
    qds = ray.data.from_items([{"query_id": 0, "text": "the"}])
    with pytest.raises(ValueError, match="null"):
        collapsed_search(idx, qds, gids, gvals, cfg)
