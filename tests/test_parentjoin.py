"""Parent-child join retrieval (ES has_child / has_parent): local
replay identity across all score modes, the min_children must-gate,
none-mode == filtered plain BM25, doc-sharded bit-identity, and the
has_parent join's brute-force replay."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.parentjoin import (
    PARENT_SALT,
    child_parent_map,
    has_child_aggregate,
    has_child_contrib,
    has_child_search,
    has_parent_search,
)
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.pipelines.sampling import salt_hash60
from mini_ivf_ray.state.stats import CorpusStats

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a")]
N_EVENTS = 900


def _children():
    """Deterministic synthetic events: type cycles, value has exactly
    two decimals (integer cents after round(v*100))."""
    return ray.data.from_items(
        [
            {
                "event_id": i,
                "event_type": ["click", "view", "error"][i % 3],
                "value": ((i * 37) % 1000) / 100.0,
            }
            for i in range(N_EVENTS)
        ]
    )


def _docs_ds(docs):
    return ray.data.from_pandas(docs[["doc_id"]])


def _qds():
    return ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )


def _plain_bm25(docs, idx, qtext):
    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    per = []
    for t in sorted(set(tokenize(qtext))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        m = tf > 0
        per.append(
            (
                ids[m],
                bm25.contributions(
                    tf[m], dl[m], stats.df[t], stats.n_docs, stats.avgdl
                ),
            )
        )
    if not per:
        return {}
    dc = np.concatenate([d for d, _ in per])
    uniq, inv = np.unique(dc, return_inverse=True)
    scores = np.zeros(uniq.size)
    np.add.at(scores, inv, np.concatenate([c for _, c in per]))
    return dict(zip(uniq.tolist(), scores.tolist()))


def _local_child_agg(docs, child_type="click"):
    """Pure-python replay of has_child_aggregate over _children()."""
    n = len(docs)
    lut = np.sort(docs["doc_id"].to_numpy().astype(np.uint64))
    agg: dict[int, list[int]] = {}
    for i in range(N_EVENTS):
        if ["click", "view", "error"][i % 3] != child_type:
            continue
        parent = int(lut[int(salt_hash60(np.array([i]), PARENT_SALT)[0]) % n])
        cents = int(np.round(((i * 37) % 1000) / 100.0 * 100.0))
        agg.setdefault(parent, []).append(cents)
    return agg


def _local_contrib(agg, score_mode, min_children):
    out = {}
    for p, cents in agg.items():
        if len(cents) < min_children:
            continue
        if score_mode == "none":
            out[p] = 0.0
        elif score_mode == "sum":
            out[p] = float(sum(cents)) / 100.0
        elif score_mode == "max":
            out[p] = float(max(cents)) / 100.0
        elif score_mode == "min":
            out[p] = float(min(cents)) / 100.0
        else:
            out[p] = (float(sum(cents)) / 100.0) / float(len(cents))
    return out


def _canon(df):
    return (
        df.sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "score_mode,min_children",
    [("sum", 1), ("sum", 2), ("max", 1), ("min", 2), ("avg", 2)],
)
def test_has_child_matches_local_replay(tiny_index, score_mode, min_children):
    idx, cfg, docs = tiny_index
    got = _canon(
        has_child_search(
            idx, _qds(), _children(), _docs_ds(docs), cfg,
            child_type="click", score_mode=score_mode,
            min_children=min_children,
        ).to_pandas()
    )
    contrib = _local_contrib(_local_child_agg(docs), score_mode, min_children)
    rows = []
    for qid, qtext in QUERIES:
        scored = _plain_bm25(docs, idx, qtext)
        cands = [
            (d, s + contrib[int(d)]) for d, s in scored.items()
            if int(d) in contrib
        ]
        cands.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(cands[: cfg.topk]):
            rows.append((qid, r, int(d), s))
    exp = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    assert len(got) == len(exp), (score_mode, min_children)
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        exp["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())
    # the must-gate is non-vacuous: qualifying parents are a strict
    # subset of the corpus, and at min_children >= 2 the top-k itself
    # differs from plain BM25
    assert 0 < len(contrib) < len(docs)
    if min_children >= 2:
        plain = search(idx, _qds(), cfg).to_pandas()
        assert set(map(int, got["doc_id"])) != set(map(int, plain["doc_id"]))


def test_has_child_none_mode_is_filtered_bm25(tiny_index):
    """score_mode='none' filters but never rescores: every surviving
    (query, doc) carries its plain-BM25 score bit-identically."""
    idx, cfg, docs = tiny_index
    got = has_child_search(
        idx, _qds(), _children(), _docs_ds(docs), cfg,
        child_type="click", score_mode="none", min_children=1,
    ).to_pandas()
    assert len(got)
    for qid, qtext in QUERIES:
        scored = _plain_bm25(docs, idx, qtext)
        g = got[got["query_id"] == qid]
        for d, s in zip(g["doc_id"], g["score"]):
            assert scored[int(d)] == s


def test_has_child_aggregate_and_contrib_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    agg = has_child_aggregate(
        _children(), _docs_ds(docs), child_type="click"
    ).to_pandas()
    local = _local_child_agg(docs)
    assert len(agg) == len(local)
    # no iterrows: it would coerce the uint64 key through float64
    for p, n, s, lo, hi in zip(
        agg["parent_doc"].to_numpy(),
        agg["n_children"].to_numpy(),
        agg["cents_sum"].to_numpy(),
        agg["cents_min"].to_numpy(),
        agg["cents_max"].to_numpy(),
    ):
        cents = local[int(p)]
        assert int(n) == len(cents)
        assert int(s) == sum(cents)
        assert int(lo) == min(cents)
        assert int(hi) == max(cents)
    with pytest.raises(ValueError, match="score_mode"):
        has_child_contrib(agg, "median", 1)
    with pytest.raises(ValueError, match="min_children"):
        has_child_contrib(agg, "sum", 0)
    # a child type with no events -> empty sidecar -> empty results
    empty = has_child_search(
        idx, _qds(), _children(), _docs_ds(docs), cfg,
        child_type="purchase", score_mode="sum", min_children=1,
    ).to_pandas()
    assert len(empty) == 0


def test_sharded_has_child_identity(tiny_index):
    """ShardedIndex.rerank_search(mode='has_child') == the
    single-index pipeline bit-for-bit (3 shards, range-sliced
    qualifying-parent sidecar)."""
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    agg = has_child_aggregate(
        _children(), _docs_ds(docs), child_type="click"
    ).to_pandas()
    ids, contrib = has_child_contrib(agg, "sum", 2)
    single = _canon(
        has_child_search(
            idx, _qds(), _children(), _docs_ds(docs), cfg,
            child_type="click", score_mode="sum", min_children=2,
        ).to_pandas()
    )
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        with pytest.raises(ValueError, match="attach_value_sidecar"):
            sharded.rerank_search(QUERIES, "has_child", {})
        sharded.attach_value_sidecar(ids, contrib)
        got = _canon(sharded.rerank_search(QUERIES, "has_child", {}))
        assert np.array_equal(
            got["doc_id"].to_numpy().astype(np.uint64),
            single["doc_id"].to_numpy().astype(np.uint64),
        )
        assert np.array_equal(
            got["score"].to_numpy(), single["score"].to_numpy()
        )
    finally:
        sharded.shutdown()


def test_has_parent_matches_local_replay(tiny_index):
    """Engine has_parent (bucketed join + partial top-k) == the brute
    join: every child inherits its parent's full BM25 score, ties
    (score desc, event_id asc)."""
    idx, cfg, docs = tiny_index
    topk = 15
    got = _canon(
        has_parent_search(
            idx, _qds(),
            _children().select_columns(["event_id"]),
            _docs_ds(docs), cfg, topk=topk, num_buckets=7,
        )
    )
    n = len(docs)
    lut = np.sort(docs["doc_id"].to_numpy().astype(np.uint64))
    ev = np.arange(N_EVENTS, dtype=np.int64)
    parent = lut[salt_hash60(ev, PARENT_SALT) % n]
    rows = []
    for qid, qtext in QUERIES:
        scored = _plain_bm25(docs, idx, qtext)
        cands = [
            (int(e), scored[int(p)])
            for e, p in zip(ev, parent)
            if int(p) in scored
        ]
        cands.sort(key=lambda x: (-x[1], x[0]))
        for r, (e, s) in enumerate(cands[:topk]):
            rows.append((qid, r, e, s))
    exp = pd.DataFrame(rows, columns=["query_id", "rank", "event_id", "score"])
    assert len(got) == len(exp)
    assert np.array_equal(
        got["event_id"].to_numpy().astype(np.int64),
        exp["event_id"].to_numpy().astype(np.int64),
    )
    assert np.array_equal(got["score"].to_numpy(), exp["score"].to_numpy())


def test_child_parent_map_is_total_and_deterministic(tiny_index):
    _, _, docs = tiny_index
    m = child_parent_map(
        _children().select_columns(["event_id"]), _docs_ds(docs)
    ).to_pandas()
    assert len(m) == N_EVENTS
    doc_set = set(map(int, docs["doc_id"]))
    assert set(map(int, m["parent_doc"])).issubset(doc_set)
    m2 = child_parent_map(
        _children().select_columns(["event_id"]), _docs_ds(docs)
    ).to_pandas()
    assert m.sort_values("event_id").equals(m2.sort_values("event_id"))


def test_children_terms_agg_matches_local_replay(tiny_index):
    """children agg (terms sub-agg): engine == a brute local replay
    over (matched parents -> their children grouped by type)."""
    from mini_ivf_ray.pipelines.parentjoin import children_terms_agg

    idx, cfg, docs = tiny_index
    got = children_terms_agg(
        idx, _qds(), _children(), _docs_ds(docs), cfg
    )
    # local replay
    ids = np.sort(docs["doc_id"].to_numpy().astype(np.uint64))
    ev = np.arange(N_EVENTS, dtype=np.int64)
    parent = ids[salt_hash60(ev, PARENT_SALT) % ids.size]
    etype = np.array([["click", "view", "error"][i % 3] for i in range(N_EVENTS)])
    cents = np.array([(i * 37) % 1000 for i in range(N_EVENTS)], dtype=np.int64)
    for qid, qtext in QUERIES:
        matched = set(
            int(d) for d, s in zip(*_match_set(docs, idx, qtext))
        )
        rows = {}
        for p, t, c in zip(parent, etype, cents):
            if int(p) in matched:
                n, s = rows.get(t, (0, 0))
                rows[t] = (n + 1, s + int(c))
        g = got[got["query_id"] == qid]
        want = {
            t: (int(n), int(s))
            for t, (n, s) in sorted(rows.items())
        }
        have = {
            r["label"]: (int(r["n_children"]), int(r["cents_sum"]))
            for _, r in g.iterrows()
        }
        assert have == want, qid
        assert list(g["label"]) == sorted(g["label"])


def _match_set(docs, idx, qtext):
    """(doc_ids, scores) full disjunctive match set — local truth."""
    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    scores = np.zeros(len(ids))
    hit = np.zeros(len(ids), dtype=bool)
    for t in sorted(set(tokenize(qtext))):
        if stats.df.get(t, 0) <= 0:
            continue
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        hit |= tf > 0
        dl = np.array([len(tk) for tk in toks], dtype=np.float64)
        idf = bm25.idf(stats.df[t], stats.n_docs)
        scores += idf * bm25.tf_norm(tf, dl, stats.avgdl, 1.2, 0.75)
    return ids[hit], scores[hit]


def test_children_terms_agg_unmatched_query_empty(tiny_index):
    from mini_ivf_ray.pipelines.parentjoin import children_terms_agg

    idx, cfg, docs = tiny_index
    qds = ray.data.from_items([{"query_id": 0, "text": "zz9999qq"}])
    out = children_terms_agg(idx, qds, _children(), _docs_ds(docs), cfg)
    assert len(out) == 0


def test_parent_terms_agg_matches_local_replay(tiny_index):
    """parent agg: distinct parents of filtered children bucketed by
    a parent attribute == brute replay; cross-block dedup pinned by
    a many-partition child table."""
    from mini_ivf_ray.pipelines.parentjoin import parent_terms_agg

    idx, cfg, docs = tiny_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    labels = np.array(
        ["g{}".format(int(d) % 3) for d in ids], dtype=object
    )
    children = _children().repartition(11)  # force cross-block parents
    got = parent_terms_agg(
        children, _docs_ds(docs), ids, labels, child_type="click"
    )
    # local replay
    sids = np.sort(ids)
    ev = np.arange(N_EVENTS, dtype=np.int64)
    etype = np.array([["click", "view", "error"][i % 3] for i in range(N_EVENTS)])
    parent = sids[salt_hash60(ev, PARENT_SALT) % sids.size]
    label_by_id = {int(d): l for d, l in zip(ids, labels)}
    want = {}
    for p in set(int(x) for x in parent[etype == "click"]):
        l = label_by_id[p]
        want[l] = want.get(l, 0) + 1
    have = dict(zip(got["label"], (int(x) for x in got["n_parents"])))
    assert have == want
    assert list(got["label"]) == sorted(got["label"])
    # sanity: distinct-parent counts are bounded by the corpus
    assert sum(have.values()) <= len(ids)
