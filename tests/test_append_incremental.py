"""Incremental (segment-adding) append — the scale path (r3 VERDICT
perf-weak #1): an increment encodes ONLY its own postings into new
``postings_inc<k>.parquet`` files; statistics (n_docs, avgdl, df) are
rebuilt exactly, and every reader recomputes WAND bounds from the
current statistics instead of trusting the stale stored ones.

Done-criteria: results (doc ids AND float64 scores) bit-identical to a
fresh union build on every query path — cold disk reader, shared
decoded reader, TAAT and forced-WAND, doc-sharded range serving — with
append cost ∝ increment size; ``compact_index`` afterwards restores the
single-segment layout byte-identically to the fresh build."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.append import append_index, append_marker_path
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.sources.pages import generate_pages
from mini_ivf_ray.state import manifest as mf
from mini_ivf_ray.state.stats import CorpusStats

QUERIES = ["the data", "web page time", "a of", "zz missing term", "data data data"]


def _split_pages(n_total=500, n_a=300, seed=71):
    pages = generate_pages(n_total, seed=seed, vocab_size=400, dup_frac=0.0)
    return pages.slice(0, n_a), pages.slice(n_a)


def _topk(idx, cfg, queries, share):
    qds = ray.data.from_items(
        [{"query_id": i, "text": t} for i, t in enumerate(queries)]
    )
    df = search(idx, qds, cfg, share=share).to_pandas()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _segment_bytes(idx, p):
    path = os.path.join(mf.partition_dir(idx, p), "postings.parquet")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return f.read()


def _build_pair(tmp_path, cfg, n_total=500, n_a=300, seed=71):
    """fresh union index + (build A, incremental-append B) index."""
    pages_a, pages_b = _split_pages(n_total, n_a, seed)
    union = ray.data.from_arrow(
        generate_pages(n_total, seed=seed, vocab_size=400, dup_frac=0.0)
    )
    fresh = str(tmp_path / "fresh")
    build_index(lambda: union, fresh, cfg)
    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)
    meta = append_index(lambda: ray.data.from_arrow(pages_b), inc, cfg)
    return fresh, inc, meta


def test_incremental_is_default_and_stats_exact(tmp_path):
    cfg = PipelineConfig(num_partitions=4)
    fresh, inc, meta = _build_pair(tmp_path, cfg)
    # auto mode picked the incremental path and recorded it
    assert meta["counters"]["stage_walls"]["append_path"] == "incremental"
    assert meta["lineage"]["increments"][-1]["mode"] == "incremental"
    assert meta["lineage"]["bounds_exact"] is False
    # statistics exactly equal the fresh union build's
    sf, si = CorpusStats.load(fresh), CorpusStats.load(inc)
    assert (sf.n_docs, sf.total_tokens, sf.max_doc_id) == (
        si.n_docs, si.total_tokens, si.max_doc_id)
    assert sf.df == si.df and sf.cf == si.cf and sf.salted == si.salted
    # increment segment files exist; base segments untouched
    inc_files = [
        f
        for p in range(cfg.num_partitions)
        for f in os.listdir(mf.partition_dir(inc, p))
        if f.startswith("postings_inc")
    ]
    assert inc_files, "no increment segment files written"
    assert not os.path.exists(append_marker_path(inc))


@pytest.mark.parametrize("share", [False, "decoded"])
def test_incremental_results_bit_identical(tmp_path, share):
    """Cold disk reader (raw eager-decode path) and shared decoded
    reader (merged re-blocked bundles): doc ids and float64 scores
    bit-equal to the fresh union build."""
    cfg = PipelineConfig(num_partitions=4)
    fresh, inc, _ = _build_pair(tmp_path, cfg)
    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES, share),
        _topk(inc, cfg, QUERIES, share),
        check_exact=True,
    )


def test_incremental_wand_path_bit_identical(tmp_path):
    """taat_threshold=0 forces block-max WAND: the recomputed (exact)
    bounds on the multi-epoch index must never prune a true top-k doc."""
    cfg = PipelineConfig(num_partitions=4, taat_threshold=0)
    fresh, inc, _ = _build_pair(tmp_path, cfg)
    for share in (False, "decoded"):
        pd.testing.assert_frame_equal(
            _topk(fresh, cfg, QUERIES, share),
            _topk(inc, cfg, QUERIES, share),
            check_exact=True,
        )


def test_incremental_twice_then_compact_byte_identical(tmp_path):
    """Two increments stay bit-identical on results; compact_index then
    merges the epochs into one segment per partition BYTE-identical to
    the fresh union build and restores bounds_exact."""
    from mini_ivf_ray.pipelines.maintenance import compact_index

    cfg = PipelineConfig(num_partitions=3)
    pages = generate_pages(450, seed=77, vocab_size=300, dup_frac=0.0)
    fresh = str(tmp_path / "fresh")
    build_index(lambda: ray.data.from_arrow(pages), fresh, cfg)

    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages.slice(0, 150)), inc, cfg)
    append_index(lambda: ray.data.from_arrow(pages.slice(150, 150)), inc, cfg)
    meta = append_index(lambda: ray.data.from_arrow(pages.slice(300)), inc, cfg)
    assert [i["increment"] for i in meta["lineage"]["increments"]] == [1, 2]
    assert all(
        i["mode"] == "incremental" for i in meta["lineage"]["increments"]
    )
    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES, False),
        _topk(inc, cfg, QUERIES, False),
        check_exact=True,
    )

    meta2 = compact_index(inc, cfg)
    assert meta2["lineage"]["bounds_exact"] is True
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(inc, p), f"partition {p}"
        # increments merged away
        assert not [
            f
            for f in os.listdir(mf.partition_dir(inc, p))
            if f.startswith("postings_inc")
        ]
    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES, False),
        _topk(inc, cfg, QUERIES, False),
        check_exact=True,
    )


def test_incremental_resume_after_interrupt(tmp_path, monkeypatch):
    """A crash before the encode resumes from the marker (same mode)
    without re-consuming the increment factory; results match fresh."""
    cfg = PipelineConfig(num_partitions=3)
    pages_a, pages_b = _split_pages(n_total=400, n_a=250, seed=83)
    fresh = str(tmp_path / "fresh")
    build_index(
        lambda: ray.data.from_arrow(
            generate_pages(400, seed=83, vocab_size=400, dup_frac=0.0)
        ),
        fresh,
        cfg,
    )
    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)

    import mini_ivf_ray.pipelines.append as app_mod

    def boom(*a, **k):
        raise RuntimeError("interrupted before encode")

    monkeypatch.setattr(app_mod, "make_spill_encoder", boom)
    with pytest.raises(RuntimeError, match="interrupted"):
        append_index(lambda: ray.data.from_arrow(pages_b), inc, cfg)
    assert os.path.exists(append_marker_path(inc))
    monkeypatch.undo()

    def explode():
        raise AssertionError("resume must not re-prepare the increment")

    meta = append_index(explode, inc, cfg)
    assert meta["counters"]["stage_walls"]["append_path"] == "incremental"
    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES, False),
        _topk(inc, cfg, QUERIES, False),
        check_exact=True,
    )


def test_incremental_duplicate_doc_raises(tmp_path):
    """Cross-epoch duplicate doc (same url re-appended) raises loudly at
    append time (the up-front broadcast-id probe — the encoder never
    sees old+new together on this path)."""
    cfg = PipelineConfig(num_partitions=2)
    pages_a, _ = _split_pages(n_total=300, n_a=200, seed=91)
    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)
    with pytest.raises(Exception, match="duplicate doc_id"):
        append_index(
            lambda: ray.data.from_arrow(pages_a.slice(0, 50)), inc, cfg
        )
    assert not os.path.exists(append_marker_path(inc))


def test_incremental_skip_existing(tmp_path):
    """on_existing='skip' drops already-indexed urls; results equal the
    fresh true-union build bit-for-bit."""
    cfg = PipelineConfig(num_partitions=3)
    pages = generate_pages(400, seed=101, vocab_size=300, dup_frac=0.0)
    fresh = str(tmp_path / "fresh")
    build_index(lambda: ray.data.from_arrow(pages), fresh, cfg)

    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages.slice(0, 250)), inc, cfg)
    meta = append_index(
        lambda: ray.data.from_arrow(pages.slice(150)),
        inc,
        cfg,
        on_existing="skip",
    )
    last = meta["lineage"]["increments"][-1]
    assert last["skipped_existing"] == 100
    assert last["new_docs"] == 150
    assert last["mode"] == "incremental"
    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES, False),
        _topk(inc, cfg, QUERIES, False),
        check_exact=True,
    )


def test_incremental_tombstones_respected(tmp_path):
    """delete_docs tombstones mask results on a multi-epoch index (the
    raw eager-decode path must honour the denied set too)."""
    from mini_ivf_ray.pipelines.maintenance import delete_docs

    cfg = PipelineConfig(num_partitions=3)
    fresh, inc, _ = _build_pair(tmp_path, cfg, n_total=300, n_a=200, seed=61)
    base = _topk(inc, cfg, QUERIES, False)
    victim = int(base["doc_id"].iloc[0])
    delete_docs(inc, [victim])
    after = _topk(inc, cfg, QUERIES, False)
    assert victim not in set(after["doc_id"].tolist())


def test_incremental_sharded_serving(tmp_path):
    """Doc-sharded range serving (ShardedIndex) over a multi-epoch
    index: raw-mode blocks trim postings exactly to each shard's range
    and the merged global top-k equals the fresh build's."""
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    cfg = PipelineConfig(num_partitions=3)
    fresh, inc, _ = _build_pair(tmp_path, cfg, n_total=300, n_a=200, seed=67)
    queries = [(i, t) for i, t in enumerate(QUERIES)]
    sh = ShardedIndex(inc, cfg, num_shards=3)
    try:
        got = (
            sh.search(queries)
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        sh.shutdown()
    want = _topk(fresh, cfg, QUERIES, False)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_exact=True)
