"""Serving paths (persistent pool, doc-sharded, decoded-shared Dataset
path) are all rank-identical to the brute-force oracle."""

import numpy as np

import ray.data
from mini_ivf_ray.pipelines.query import brute_force_topk, search
from mini_ivf_ray.pipelines.serving import ServingPool, ShardedIndex


def _queries(docs, rng, nq=15):
    from mini_ivf_ray.functions.tokenize import tokenize

    vocab = sorted({t for text in docs["text"] for t in tokenize(text)})
    return [
        (qid, " ".join(rng.choice(vocab, size=rng.integers(1, 5))))
        for qid in range(nq)
    ]


def _assert_same(res, oracle):
    res = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    oracle = oracle.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(res) == len(oracle)
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(res["score"].to_numpy(), oracle["score"].to_numpy())


def test_serving_pool_rank_identical(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(17)
    queries = _queries(docs, rng)
    oracle = brute_force_topk(docs, queries, cfg)
    pool = ServingPool(idx, cfg, num_actors=2)
    try:
        pool.warmup(queries[:3])
        _assert_same(pool.search(queries, chunk=4), oracle)
    finally:
        pool.shutdown()


def test_sharded_index_rank_identical(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(19)
    queries = _queries(docs, rng)
    oracle = brute_force_topk(docs, queries, cfg)
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        _assert_same(sharded.search(queries, chunk=5), oracle)
    finally:
        sharded.shutdown()


def test_decoded_share_matches_cold_path(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(23)
    queries = _queries(docs, rng)
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    warm = search(idx, qds, cfg, share="decoded").to_pandas()
    qds2 = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    cold = search(idx, qds2, cfg, share=False).to_pandas()
    _assert_same(warm, cold)


def test_pool_metrics_queryobs(tiny_index):
    """QueryObs analog: the pool exposes a per-partition probe
    histogram alongside the searched/rounds counters."""
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(29)
    queries = _queries(docs, rng, nq=10)
    pool = ServingPool(idx, cfg, num_actors=2)
    try:
        pool.search(queries, chunk=3)
        m = pool.metrics()
        assert m["n_queries"] >= 10
        assert m["avg_searched_cnt"] > 0
        probes = m["partition_probes"]
        assert probes and all(
            isinstance(p, int) and 0 <= p < cfg.num_partitions for p in probes
        )
        assert sum(probes.values()) > 0
    finally:
        pool.shutdown()
