"""Regressions for round-1 advisor findings.

1. ShardedIndex boundary blocks: a neighbouring shard scores a foreign
   doc with only the query terms whose blocks cross into its range — a
   PARTIAL score.  The merge must keep the max (= home shard's full)
   score per (query_id, doc_id), not the first duplicate.
2. Hot-term salt cuts: with dense external ids (doc_id_from_url=False)
   the encoder must replay the assigner's doc_id_space when cutting
   salted runs, or blocks span doc ranges held by other partitions and
   WAND silently skips postings.
3. docID hash-collision detection inside the dedup bucket.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.extract import wrap_html
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.query import brute_force_topk, search
from mini_ivf_ray.pipelines.serving import ShardedIndex


def _dense_corpus(n=240, seed=7) -> pa.Table:
    """Dense-id corpus where common terms appear on interleaved strides,
    so posting blocks of different query terms cross shard boundaries at
    MISALIGNED doc positions (the partial-score repro shape)."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        words = []
        if i % 2 == 0:
            words.append("alpha")
        if i % 3 == 0:
            words.append("beta")
        if i % 5 == 0:
            words.append("gamma")
        words += [f"w{int(x):03d}" for x in rng.integers(0, 40, size=6)]
        texts.append(" ".join(words))
    urls = [f"https://d.example/p/{i}" for i in range(n)]
    ts = np.datetime64("2024-03-01", "us") + np.arange(n).astype("timedelta64[us]")
    return pa.table(
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


_QUERIES = [
    (0, "alpha beta"),
    (1, "alpha gamma"),
    (2, "beta gamma"),
    (3, "alpha beta gamma"),
    (4, "alpha w001"),
    (5, "beta w002 w003"),
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


@pytest.fixture(scope="module")
def dense_docs():
    return _dense_corpus()


def _boundary_corpus() -> pa.Table:
    """Hand-crafted advisor repro: with 2 shards over ids [0, 60) the
    boundary is 30; 'alpha' lives in docs 16..45 (block [16..31] crosses
    the boundary), 'beta' in docs 31..34 and 46..57 (its block starts at
    31, so it does NOT cross into shard 0).  Docs 31..34 carry alpha
    with tf=3 + beta: shard 0 sees doc 31 via the crossing alpha block
    and scores it WITHOUT beta — a partial score high enough to make
    shard 0's local top-k."""
    n = 60
    texts = []
    for i in range(n):
        words = [f"f{i:03d}", f"g{i:03d}"]  # unique filler, constant dl
        if 31 <= i <= 34:
            words += ["alpha", "alpha", "alpha", "beta"]
        else:
            if 16 <= i <= 45:
                words.append("alpha")
            if 46 <= i <= 57:
                words.append("beta")
        texts.append(" ".join(words))
    urls = [f"https://b.example/p/{i}" for i in range(n)]
    ts = np.datetime64("2024-03-01", "us") + np.arange(n).astype("timedelta64[us]")
    return pa.table(
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


def test_sharded_partial_score_boundary_repro(tmp_path):
    """The advisor-verified failure: the partial-scored foreign doc must
    not be kept over its home shard's full score."""
    docs_tbl = _boundary_corpus()
    cfg = PipelineConfig(
        num_partitions=1, block_size=16, topk=10, doc_id_from_url=False
    )
    idx = str(tmp_path / "boundary_idx")
    build_index(lambda: ray.data.from_arrow(docs_tbl), idx, cfg, dedup=False)
    docs = docs_tbl.to_pandas()
    queries = [(0, "alpha beta")]
    oracle = brute_force_topk(docs, queries, cfg)
    sharded = ShardedIndex(idx, cfg, num_shards=2)
    try:
        _assert_same(sharded.search(queries), oracle)
    finally:
        sharded.shutdown()


def test_sharded_partial_scores_dense_ids(dense_docs, tmp_path):
    """Dense ids + tiny blocks force boundary blocks whose foreign docs
    get partial scores on a neighbour shard; merge must still be
    rank-identical (advisor-verified repro of the drop_duplicates bug)."""
    cfg = PipelineConfig(
        num_partitions=2, block_size=16, topk=10, doc_id_from_url=False
    )
    idx = str(tmp_path / "dense_idx")
    build_index(lambda: ray.data.from_arrow(dense_docs), idx, cfg, dedup=False)
    docs = dense_docs.to_pandas()
    oracle = brute_force_topk(docs, _QUERIES, cfg)
    for num_shards in (2, 3):
        sharded = ShardedIndex(idx, cfg, num_shards=num_shards)
        try:
            _assert_same(sharded.search(_QUERIES, chunk=3), oracle)
        finally:
            sharded.shutdown()


def test_hot_salt_dense_ids_rank_identity(dense_docs, tmp_path):
    """doc_id_from_url=False + tiny hot_df_threshold + num_partitions <
    nsalt: salt sub-lists collide onto one partition; encoder cuts must
    use the dense doc_id_space (max_doc_id+1), not 2**64, to keep blocks
    globally disjoint (advisor medium finding)."""
    cfg = PipelineConfig(
        num_partitions=2,
        block_size=16,
        topk=10,
        hot_df_threshold=10,  # alpha df=120 -> 12 salts >> 2 partitions
        doc_id_from_url=False,
    )
    idx = str(tmp_path / "salted_idx")
    build_index(lambda: ray.data.from_arrow(dense_docs), idx, cfg, dedup=False)
    docs = dense_docs.to_pandas()
    oracle = brute_force_topk(docs, _QUERIES, cfg)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in _QUERIES]
    )
    res = search(idx, qds, cfg).to_pandas()
    _assert_same(res, oracle)


def test_docid_collision_raises():
    """Two distinct urls sharing a doc_id must fail loudly in the dedup
    bucket, not silently merge identities."""
    from mini_ivf_ray.stages.prepare import _keep_latest

    ts = np.datetime64("2024-03-01", "us") + np.arange(2).astype("timedelta64[us]")
    group = pa.table(
        {
            "url": pa.array(["https://a.example/x", "https://b.example/y"]),
            "warc_ts": pa.array(ts),
            "text": pa.array(["aa", "bb"]),
            "doc_id": pa.array(np.array([7, 7], dtype=np.uint64)),
            "bucket": pa.array(np.array([7, 7], dtype=np.int64)),
        }
    )
    with pytest.raises(ValueError, match="collision"):
        _keep_latest(group)
