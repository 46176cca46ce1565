"""Incremental append (r2 VERDICT missing #1; reference workflow:
LoadIndex -> Populate, test_ivfpq_sift1m_baseline.cpp:53-56).

Done-criteria from the verdict: build A, append B must equal a fresh
build of A ∪ B byte-identically on segments and rank-identically on
queries.
"""

import os
import shutil

import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.append import append_index, append_marker_path
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.sources.pages import generate_pages
from mini_ivf_ray.state import manifest as mf
from mini_ivf_ray.state.stats import CorpusStats


def _segment_bytes(idx, p):
    path = os.path.join(mf.partition_dir(idx, p), "postings.parquet")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return f.read()


def _split_pages(n_total=500, n_a=300, seed=71):
    # one table, disjoint url slices (dup_frac=0: cross-slice url reuse
    # would be a cross-increment duplicate, tested separately below)
    pages = generate_pages(n_total, seed=seed, vocab_size=400, dup_frac=0.0)
    return pages.slice(0, n_a), pages.slice(n_a)


def _topk(idx, cfg, queries):
    qds = ray.data.from_items(
        [{"query_id": i, "text": t} for i, t in enumerate(queries)]
    )
    df = search(idx, qds, cfg, share=False).to_pandas()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


QUERIES = ["the data", "web page time", "a of", "zz missing term", "data data data"]


def test_append_equals_fresh_build(tmp_path):
    cfg = PipelineConfig(num_partitions=4)
    pages_a, pages_b = _split_pages()
    union = ray.data.from_arrow(generate_pages(500, seed=71, vocab_size=400, dup_frac=0.0))

    fresh = str(tmp_path / "fresh")
    build_index(lambda: union, fresh, cfg)

    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)
    meta = append_index(
        lambda: ray.data.from_arrow(pages_b), inc, cfg, mode="rewrite"
    )

    # stats identical
    sf, si = CorpusStats.load(fresh), CorpusStats.load(inc)
    assert (sf.n_docs, sf.total_tokens, sf.max_doc_id) == (
        si.n_docs, si.total_tokens, si.max_doc_id)
    assert sf.df == si.df and sf.cf == si.cf and sf.salted == si.salted

    # segments byte-identical
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(inc, p), f"partition {p}"

    # queries rank-identical (scores are float64-identical since every
    # encode input matched)
    import pandas as pd

    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES), _topk(inc, cfg, QUERIES)
    )

    # lineage records the increment
    assert meta["lineage"]["increments"][-1]["new_docs"] == 200
    assert not os.path.exists(append_marker_path(inc))
    assert not os.path.exists(os.path.join(inc, "prev_segments"))


@pytest.mark.parametrize("force_resalt", [False, True])
def test_append_paths_byte_identical(tmp_path, force_resalt):
    """Both append paths — segment-run fast path (unchanged plan) and
    forced resalt — produce byte-identical segments vs a fresh union
    build."""
    cfg = PipelineConfig(num_partitions=4)
    pages_a, pages_b = _split_pages(n_total=500, n_a=300, seed=71)
    union = ray.data.from_arrow(
        generate_pages(500, seed=71, vocab_size=400, dup_frac=0.0)
    )
    fresh = str(tmp_path / "fresh")
    build_index(lambda: union, fresh, cfg)

    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)
    meta = append_index(
        lambda: ray.data.from_arrow(pages_b),
        inc,
        cfg,
        mode="rewrite",
        _force_resalt=force_resalt,
    )
    path_taken = meta["counters"]["stage_walls"]["append_path"]
    if force_resalt:
        assert path_taken == "resalt"
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(inc, p), (
            f"partition {p} path={path_taken}"
        )


def test_append_twice(tmp_path):
    """A ∪ B ∪ C via two appends == fresh build."""
    cfg = PipelineConfig(num_partitions=3)
    pages = generate_pages(450, seed=77, vocab_size=300, dup_frac=0.0)
    fresh = str(tmp_path / "fresh")
    build_index(lambda: ray.data.from_arrow(pages), fresh, cfg)

    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages.slice(0, 150)), inc, cfg)
    append_index(
        lambda: ray.data.from_arrow(pages.slice(150, 150)), inc, cfg,
        mode="rewrite",
    )
    meta = append_index(
        lambda: ray.data.from_arrow(pages.slice(300)), inc, cfg,
        mode="rewrite",
    )
    assert [i["increment"] for i in meta["lineage"]["increments"]] == [1, 2]
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(inc, p)


def test_append_resume_after_interrupt(tmp_path, monkeypatch):
    """An append interrupted after the snapshot (marker present, no
    partitions committed yet) resumes to the same byte-identical
    result; a plain build_index on the mid-append index refuses."""
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
        append_index(
            lambda: ray.data.from_arrow(pages_b), inc, cfg, mode="rewrite"
        )
    assert os.path.exists(append_marker_path(inc))

    # plain build refuses to touch a mid-append index
    with pytest.raises(RuntimeError, match="append is in progress"):
        build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)

    monkeypatch.undo()
    # the factory must NOT be re-consumed on resume (prepare was done)
    def explode():
        raise AssertionError("resume must not re-prepare the increment")

    append_index(explode, inc, cfg)  # mode comes from the marker
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(inc, p)


def test_append_duplicate_doc_raises(tmp_path):
    """A document url present in both the old index and the increment
    is a duplicate (term, doc_id) posting — the encoder must raise, not
    silently double-count."""
    cfg = PipelineConfig(num_partitions=2)
    pages_a, _ = _split_pages(n_total=300, n_a=200, seed=91)
    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages_a), inc, cfg)
    with pytest.raises(Exception, match="duplicate doc_id"):
        append_index(
            lambda: ray.data.from_arrow(pages_a.slice(0, 50)), inc, cfg
        )


def test_append_skip_existing(tmp_path):
    """on_existing='skip': a re-crawl increment overlapping the
    committed index drops the already-indexed urls (committed version
    wins) and the result equals a fresh build of the true union,
    byte-identically."""
    cfg = PipelineConfig(num_partitions=3)
    pages = generate_pages(400, seed=101, vocab_size=300, dup_frac=0.0)
    fresh = str(tmp_path / "fresh")
    build_index(lambda: ray.data.from_arrow(pages), fresh, cfg)

    inc = str(tmp_path / "inc")
    build_index(lambda: ray.data.from_arrow(pages.slice(0, 250)), inc, cfg)
    # increment rows 150..400 overlap the committed 150..250
    meta = append_index(
        lambda: ray.data.from_arrow(pages.slice(150)),
        inc,
        cfg,
        on_existing="skip",
        mode="rewrite",
    )
    last = meta["lineage"]["increments"][-1]
    assert last["skipped_existing"] == 100
    assert last["new_docs"] == 150
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(inc, p)

    with pytest.raises(ValueError, match="on_existing"):
        append_index(
            lambda: ray.data.from_arrow(pages.slice(0, 10)),
            inc,
            cfg,
            on_existing="replace",
        )


def test_append_requires_committed_index(tmp_path):
    cfg = PipelineConfig(num_partitions=2)
    with pytest.raises(FileNotFoundError):
        append_index(
            lambda: ray.data.from_arrow(generate_pages(10, seed=1)),
            str(tmp_path / "nope"),
            cfg,
        )


def test_cli_append_roundtrip(tmp_path):
    """`python -m mini_ivf_ray append` wires the incremental path."""
    import pyarrow.parquet as pq

    from mini_ivf_ray.__main__ import main

    pages_a, pages_b = _split_pages(n_total=200, n_a=120, seed=97)
    pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
    for d, t in ((pa_dir, pages_a), (pb_dir, pages_b)):
        os.makedirs(d)
        pq.write_table(t, os.path.join(d, "pages.parquet"))
    idx = str(tmp_path / "idx")
    assert main(["build", pa_dir, idx, "--partitions", "2"]) == 0
    assert main(["append", pb_dir, idx]) == 0
    from mini_ivf_ray.state import manifest as mfmod

    meta = mfmod.read_index_manifest(idx)
    assert meta["lineage"]["increments"][-1]["increment"] == 1
    assert meta["n_docs"] == 200
