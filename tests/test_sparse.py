"""Sparse-vector (weighted-term dot product) retrieval: local replay
identity, uniform-weight degeneracy, scale invariance, OOV, weight
contract, tombstones, sharded == single."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.sparse import (
    sparse_vector_search,
    validate_weights,
)

SPARSE_QUERIES: list[tuple[int, dict[str, float]]] = [
    (0, {"the": 0.25, "data": 2.0, "web": 1.5}),
    (1, {"w00042": 3.0, "of": 0.5}),
    (2, {"data": 1.0}),
]


def _qds(queries=SPARSE_QUERIES):
    return ray.data.from_items(
        [
            {
                "query_id": q,
                "terms": sorted(w),
                "weights": [w[t] for t in sorted(w)],
            }
            for q, w in queries
        ]
    )


def _local_topk(docs, weights, k):
    """Brute dot product over the tokenized corpus."""
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    scores = np.zeros(len(ids), dtype=np.float64)
    for t in sorted(weights):
        tf = np.array([tk.count(t) for tk in toks], dtype=np.float64)
        scores += np.float64(weights[t]) * tf
    m = scores > 0
    out = sorted(
        zip(scores[m], ids[m]), key=lambda p: (-p[0], p[1])
    )[:k]
    return [(int(d), float(s)) for s, d in out]


def test_matches_local_replay(tiny_index):
    idx, cfg, docs = tiny_index
    res = sparse_vector_search(idx, _qds(), cfg).to_pandas()
    for qid, w in SPARSE_QUERIES:
        want = _local_topk(docs, w, cfg.topk)
        g = res[res["query_id"] == qid].sort_values("rank")
        got = [
            (int(d), float(s))
            for d, s in zip(
                g["doc_id"].to_numpy().astype(np.uint64), g["score"]
            )
        ]
        assert got == want, qid


def test_uniform_weights_score_is_tf_sum(tiny_index):
    """w == 1 for every term -> score == total tf over matched terms."""
    idx, cfg, docs = tiny_index
    w = {"the": 1.0, "data": 1.0}
    res = (
        sparse_vector_search(idx, _qds([(0, w)]), cfg)
        .to_pandas()
        .sort_values("rank")
    )
    toks = {
        int(d): tokenize(t)
        for d, t in zip(
            docs["doc_id"].to_numpy().astype(np.uint64), docs["text"]
        )
    }
    for d, s in zip(res["doc_id"].astype(np.uint64), res["score"]):
        want = float(toks[int(d)].count("the") + toks[int(d)].count("data"))
        assert s == want, d


def test_weight_scaling_preserves_ranking(tiny_index):
    """Scaling every weight by a power of two scales scores exactly
    and preserves the ranking bit-for-bit."""
    idx, cfg, docs = tiny_index
    w = SPARSE_QUERIES[0][1]
    w4 = {t: 4.0 * v for t, v in w.items()}
    a = (
        sparse_vector_search(idx, _qds([(0, w)]), cfg)
        .to_pandas()
        .sort_values("rank")
    )
    b = (
        sparse_vector_search(idx, _qds([(0, w4)]), cfg)
        .to_pandas()
        .sort_values("rank")
    )
    assert np.array_equal(
        a["doc_id"].to_numpy().astype(np.uint64),
        b["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(
        4.0 * a["score"].to_numpy(), b["score"].to_numpy()
    )


def test_oov_term_is_inert_and_pure_oov_empty(tiny_index):
    idx, cfg, docs = tiny_index
    w = {"data": 2.0, "web": 1.0}
    w_oov = dict(w, zz9999qq=5.0)
    a = (
        sparse_vector_search(idx, _qds([(0, w)]), cfg)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    b = (
        sparse_vector_search(idx, _qds([(0, w_oov)]), cfg)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    empty = sparse_vector_search(
        idx, _qds([(0, {"zz9999qq": 1.0})]), cfg
    ).to_pandas()
    assert len(empty) == 0


def test_weight_contract():
    with pytest.raises(ValueError, match="must be > 0"):
        validate_weights({"data": 0.0})
    with pytest.raises(ValueError, match="must be > 0"):
        validate_weights({"data": -1.0})
    with pytest.raises(ValueError, match="one token"):
        validate_weights({"two words": 1.0})
    # tokenizer-equivalent keys merge additively (DATA -> data)
    assert validate_weights({"DATA": 1.0, "data": 2.0}) == {"data": 3.0}


def test_tombstones_masked(tiny_index, tmp_path):
    """Deleting the top doc removes it; survivors keep exact scores."""
    import shutil

    from mini_ivf_ray.pipelines.maintenance import delete_docs

    idx, cfg, docs = tiny_index
    q = [(0, {"data": 2.0, "the": 0.5})]
    base = (
        sparse_vector_search(idx, _qds(q), cfg)
        .to_pandas()
        .sort_values("rank")
    )
    top = int(base["doc_id"].astype(np.uint64).iloc[0])
    idx2 = str(tmp_path / "tomb")
    shutil.copytree(idx, idx2)
    delete_docs(idx2, [top])
    after = (
        sparse_vector_search(idx2, _qds(q), cfg)
        .to_pandas()
        .sort_values("rank")
    )
    assert top not in set(after["doc_id"].astype(np.uint64))
    keep = base[base["doc_id"].astype(np.uint64) != top]
    m = min(len(keep), len(after))
    assert np.array_equal(
        keep["doc_id"].to_numpy().astype(np.uint64)[:m],
        after["doc_id"].to_numpy().astype(np.uint64)[:m],
    )
    assert np.array_equal(
        keep["score"].to_numpy()[:m], after["score"].to_numpy()[:m]
    )


def test_sharded_equals_single(tiny_index):
    """ShardedIndex.similarity_search(model='sparse') == the
    single-index pipeline bit-exactly, 3 shards."""
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    idx, cfg, docs = tiny_index
    single = (
        sparse_vector_search(idx, _qds(), cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        wbq = {q: validate_weights(w) for q, w in SPARSE_QUERIES}
        got = sharded.similarity_search(
            [(q, "") for q, _ in SPARSE_QUERIES],
            "sparse",
            {"weights_by_query": wbq},
        )
    finally:
        sharded.shutdown()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(single)
    for c, dt in (("doc_id", np.uint64), ("score", np.float64)):
        assert np.array_equal(
            got[c].to_numpy().astype(dt), single[c].to_numpy().astype(dt)
        ), c
