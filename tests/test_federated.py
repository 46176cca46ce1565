"""Federated multi-index DFS search: global-stats merge == the
single union-corpus index bit-identically; query_then_fetch (local
stats) provably diverges; overlap detection; contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.federated import dfs_multi_search, global_stats
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.state.stats import CorpusStats

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a page")]


@pytest.fixture(scope="module")
def fed_env(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(420, seed=47, vocab_size=300, dup_frac=0.0)
    base = tmp_path_factory.mktemp("fed")
    union = str(base / "union")
    build_index(lambda: ray.data.from_arrow(tbl), union, cfg)
    # split by position: two independent builds over disjoint halves
    halves = []
    for i, sl in enumerate([tbl.slice(0, 210), tbl.slice(210)]):
        idx = str(base / f"half{i}")
        build_index(lambda s=sl: ray.data.from_arrow(s), idx, cfg)
        halves.append(idx)
    return union, halves, cfg


def test_dfs_merge_is_bit_identical_to_union_index(fed_env):
    union, halves, cfg = fed_env
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    want = (
        search(union, qds, cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        dfs_multi_search(halves, QUERIES, cfg, dfs=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        want["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())
    # the aggregated stats equal the union index's own stats
    g = global_stats([CorpusStats.load(h) for h in halves])
    u = CorpusStats.load(union)
    assert g["n_docs"] == u.n_docs
    assert g["total_tokens"] == u.total_tokens
    assert g["df"] == u.df
    assert g["cf"] == u.cf


def test_query_then_fetch_diverges(fed_env):
    """Local-stats merging (ES's default) genuinely mis-scores: at
    least one query's scores differ from the union index — the skew
    the DFS phase exists to fix."""
    union, halves, cfg = fed_env
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    want = (
        search(union, qds, cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    naive = (
        dfs_multi_search(halves, QUERIES, cfg, dfs=False)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert not np.array_equal(
        naive["score"].to_numpy()[: len(want)], want["score"].to_numpy()
    )


def test_overlap_detected_and_contracts(fed_env):
    union, halves, cfg = fed_env
    with pytest.raises(ValueError, match="overlap"):
        dfs_multi_search([halves[0], halves[0]], QUERIES[:1], cfg)
    with pytest.raises(ValueError, match="no indices"):
        dfs_multi_search([], QUERIES, cfg)
    with pytest.raises(ValueError, match="no indices"):
        global_stats([])
    # single index degenerates to plain search bit-identically
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in QUERIES]
    )
    want = (
        search(union, qds, cfg)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = (
        dfs_multi_search([union], QUERIES, cfg)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        want["doc_id"].to_numpy().astype(np.uint64),
    )
