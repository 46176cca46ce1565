"""Tombstone consistency across EVERY serving surface: query.search
masks persisted tombstones by default — ServingPool, ShardedIndex
(plain search, facet_search, collapsed_search), faceted_search and
collapsed_search must agree, or a deleted doc surfaces from one door
after vanishing from another."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.collapse import collapsed_search
from mini_ivf_ray.pipelines.facets import faceted_search
from mini_ivf_ray.pipelines.maintenance import delete_docs
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.pipelines.serving import ServingPool, ShardedIndex
from mini_ivf_ray.sources.pages import generate_pages
from mini_ivf_ray.stages.prepare import prepare_documents

import pytest

QUERIES = [(0, "the data"), (1, "web page time"), (2, "a of the")]


@pytest.fixture(scope="module")
def tomb_index(tmp_path_factory):
    cfg = PipelineConfig(num_partitions=4, topk=10)
    tbl = generate_pages(400, seed=31, vocab_size=300, dup_frac=0.0)
    idx = str(tmp_path_factory.mktemp("tomb") / "idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    # tombstone docs that actually rank: the current top-2 of query 0
    qds = ray.data.from_items([{"query_id": 0, "text": QUERIES[0][1]}])
    top = search(idx, qds, cfg).to_pandas().sort_values("rank")
    victims = top["doc_id"].to_numpy().astype(np.uint64)[:2]
    delete_docs(idx, victims)
    return idx, cfg, docs, set(int(v) for v in victims)


def _search_df(idx, cfg):
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    return (
        search(idx, qds, cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def _canon(df):
    df = df.copy()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_pool_and_sharded_match_search(tomb_index):
    idx, cfg, docs, victims = tomb_index
    base = _search_df(idx, cfg)
    assert not set(base["doc_id"].astype("int64")) & victims
    pool = ServingPool(idx, cfg, num_actors=2)
    try:
        via_pool = pool.search(QUERIES)
    finally:
        pool.shutdown()
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        via_shard = sharded.search(QUERIES)
    finally:
        sharded.shutdown()
    pd.testing.assert_frame_equal(
        _canon(base), _canon(via_pool), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        _canon(base), _canon(via_shard), check_dtype=False
    )
    assert list(_canon(base)["score"]) == list(_canon(via_shard)["score"])


def test_facets_and_collapse_exclude_tombstones(tomb_index):
    idx, cfg, docs, victims = tomb_index
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    vals = [f"g{int(d) % 4}" for d in ids]
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    panel = faceted_search(idx, qds, ids, vals, cfg).to_pandas()
    loose = faceted_search(
        idx, qds, ids, vals, cfg, respect_deletes=False
    ).to_pandas()
    # the tombstoned docs matched query 0, so live counts must be lower
    assert panel["n_docs"].sum() < loose["n_docs"].sum()
    col = collapsed_search(idx, qds, ids, vals, cfg).to_pandas()
    assert not set(col["doc_id"].astype("int64")) & victims
    # sharded paths agree with the single-index live panels
    sharded = ShardedIndex(idx, cfg, num_shards=3)
    try:
        sharded.attach_sidecar(ids, vals)
        sp = sharded.facet_search(QUERIES)
        sc = sharded.collapsed_search(QUERIES)
    finally:
        sharded.shutdown()
    pd.testing.assert_frame_equal(
        panel.sort_values(["query_id", "facet"]).reset_index(drop=True),
        sp.sort_values(["query_id", "facet"]).reset_index(drop=True),
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        _canon(col.rename(columns={"grp": "grp"})),
        _canon(sc),
        check_dtype=False,
    )
