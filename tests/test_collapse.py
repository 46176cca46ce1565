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

def test_dup_collapsed_composition(tmp_path):
    """Near-dup clustering composed into collapse serving (the
    dup_collapsed_topk driver entry): duplicate-cluster labels (CC
    min-member over exact-verified jaccard pairs; singletons label
    themselves) collapse the ranking to one result per cluster,
    identical to a local replay over the full brute-force ranking —
    and the collapse provably bites (a multi-member cluster matches)."""
    import pandas as pd
    import pyarrow as pa

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.functions.extract import wrap_html
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.dedup import (
        connected_components,
        lsh_candidate_pairs,
        verify_pairs_exact,
    )

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "web data index shard merge spill encode decode block heap",
        "query top ranking score bound prune skip list heap merge",
        "crawl frontier fetch parse extract tokenize posting varint",
    ]
    texts, groups = [], []
    for gi, t in enumerate(base):
        texts.append(t)
        groups.append(gi)
        texts.append(t)  # exact duplicate -> jaccard 1.0
        groups.append(gi)
        if gi < 2:  # near-duplicate: one token appended
            texts.append(t + " extra")
            groups.append(gi)
    for i in range(12):  # singletons
        texts.append(f"unique{i} filler{i} lone{i} word{i} token{i}")
        groups.append(100 + i)
    n = len(texts)
    urls = [f"https://d.example/p/{i}" for i in range(n)]
    ts = np.datetime64("2024-03-01", "us") + np.arange(n).astype("timedelta64[us]")
    tbl = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(
                [wrap_html(t, title=u) for t, u in zip(texts, urls)],
                type=pa.binary(),
            ),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    cfg = PipelineConfig(num_partitions=2, topk=5, doc_id_from_url=False)
    idx = str(tmp_path / "dup_idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg, dedup=False)
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})

    docs_ds = ray.data.from_pandas(docs)
    cand = lsh_candidate_pairs(docs_ds, k=64, bands=16, threshold=0.5).to_pandas()
    pairs = verify_pairs_exact(docs_ds, cand, w=3, threshold=0.6)
    assert len(pairs), "fixture must contain verified near-dups"
    comp = connected_components(pairs[["id_a", "id_b"]])
    # every planted duplicate group must cluster to its min member
    cmap = dict(
        zip(comp["doc_id"].astype(np.int64), comp["cluster_id"].astype(np.int64))
    )
    planted = {}
    for i, g in enumerate(groups):
        planted.setdefault(g, []).append(i)
    for g, members in planted.items():
        if len(members) > 1:
            for m in members:
                assert cmap.get(m) == min(members), (g, members)

    ids = docs["doc_id"].to_numpy()
    s = pd.Series(ids, dtype=np.int64)
    lab = (
        s.map(
            pd.Series(
                comp["cluster_id"].to_numpy(np.int64),
                index=comp["doc_id"].to_numpy(np.int64),
            )
        )
        .fillna(s)
        .astype(np.int64)
    )
    queries = [(0, "alpha beta gamma"), (1, "web data merge"), (2, "nosuchterm")]
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    res = collapsed_search(
        idx, qds, ids.astype(np.uint64), lab.astype(str).tolist(), cfg
    ).to_pandas()

    wide = dataclasses.replace(cfg, topk=len(docs))
    full = brute_force_topk(docs, queries, wide)
    lmap = dict(zip((int(i) for i in ids), (int(x) for x in lab)))
    hit_multi = False
    for qid, _ in queries:
        g = full[full["query_id"] == qid].sort_values("rank")
        seen, rows = set(), []
        for d, sc in zip(g["doc_id"].to_numpy().astype(np.uint64), g["score"]):
            grp = lmap[int(d)]
            if grp in seen:
                hit_multi = True
                continue
            seen.add(grp)
            rows.append((int(d), grp, float(sc)))
            if len(rows) == cfg.topk:
                break
        got_g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(d), int(gr), float(sc))
            for d, gr, sc in zip(
                got_g["doc_id"].to_numpy().astype(np.uint64),
                got_g["grp"],
                got_g["score"],
            )
        ]
        assert got == rows, qid
    assert hit_multi, "no multi-member cluster matched — vacuous fixture"
