"""Grouped top-hits (terms agg + top_hits): local replay identity,
group selection rule, per-group hit caps."""

import dataclasses

import numpy as np

import ray.data
from mini_ivf_ray.pipelines.collapse import grouped_top_hits
from mini_ivf_ray.pipelines.query import brute_force_topk

N_PER_GROUP = 3
MAX_GROUPS = 2


def _groups(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    return ids, [f"g{int(d) % 5}" for d in ids]


def _run(idx, cfg, docs, queries):
    gids, gvals = _groups(docs)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    return grouped_top_hits(
        idx, qds, gids, gvals, cfg,
        n_per_group=N_PER_GROUP, max_groups=MAX_GROUPS,
    ).to_pandas()


def _local_top_hits(docs, queries, cfg):
    """Exhaustive reference: full score set -> group counts -> top
    MAX_GROUPS groups by (count desc, label asc) -> top N_PER_GROUP
    hits per group by (score desc, doc asc)."""
    wide = dataclasses.replace(cfg, topk=len(docs))
    full = brute_force_topk(docs, queries, wide)
    gids, gvals = _groups(docs)
    gmap = dict(zip((int(i) for i in gids), gvals))
    out = {}
    for qid, _ in queries:
        g = full[full["query_id"] == qid].sort_values("rank")
        rows = [
            (gmap[int(d)], int(d), float(s))
            for d, s in zip(g["doc_id"].to_numpy().astype(np.uint64), g["score"])
        ]
        counts = {}
        for grp, _, _ in rows:
            counts[grp] = counts.get(grp, 0) + 1
        sel = sorted(counts, key=lambda k: (-counts[k], k))[:MAX_GROUPS]
        expect = []
        for grp in sel:
            hits = [(d, s) for g2, d, s in rows if g2 == grp][:N_PER_GROUP]
            for hr, (d, s) in enumerate(hits):
                expect.append((grp, counts[grp], hr, d, s))
        out[qid] = expect
    return out


def test_top_hits_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    queries = [(0, "the data web"), (1, "w00042 w00100"), (2, "zz9999qq")]
    res = _run(idx, cfg, docs, queries)
    want = _local_top_hits(docs, queries, cfg)
    assert set(res["query_id"]) <= {0, 1}
    for qid, _ in queries:
        g = res[res["query_id"] == qid]
        got = [
            (str(r.grp), int(r.grp_count), int(r.hit_rank),
             int(r.doc_id), float(r.score))
            for r in g.itertuples()
        ]
        assert got == want[qid], qid


def test_top_hits_caps_and_counts(tiny_index):
    idx, cfg, docs = tiny_index
    res = _run(idx, cfg, docs, [(0, "the a of")])
    g = res[res["query_id"] == 0]
    # at most MAX_GROUPS groups, each with at most N_PER_GROUP hits
    assert g["grp"].nunique() <= MAX_GROUPS
    assert (g.groupby("grp")["hit_rank"].count() <= N_PER_GROUP).all()
    # grp_count is constant within a group and >= hits returned
    for grp, sub in g.groupby("grp"):
        assert sub["grp_count"].nunique() == 1
        assert int(sub["grp_count"].iloc[0]) >= len(sub)
    # hits within a group are score-desc, doc-asc
    for _, sub in g.groupby("grp"):
        sub = sub.sort_values("hit_rank")
        assert (sub["score"].diff().dropna() <= 1e-12).all()


def test_top_hits_group_selection_by_count(tiny_index):
    """The selected groups are exactly the MAX_GROUPS most-populated
    ones over the FULL match set (count desc, label asc)."""
    idx, cfg, docs = tiny_index
    queries = [(0, "the a of")]
    res = _run(idx, cfg, docs, queries)
    want = _local_top_hits(docs, queries, cfg)
    got_groups = list(dict.fromkeys(res[res["query_id"] == 0]["grp"]))
    want_groups = list(dict.fromkeys(g for g, *_ in want[0]))
    assert got_groups == want_groups
