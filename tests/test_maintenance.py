"""Delete (tombstones) + compaction: the index-maintenance lifecycle.

Done-criteria mirroring test_append.py's: tombstoned docs vanish from
search immediately with survivors' scores bit-identical (live-docs
semantics, stats unchanged); after compact_index the index equals a
fresh build of the remaining corpus byte-identically on segments and
rank-identically on queries.
"""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.maintenance import (
    compact_index,
    compact_marker_path,
    delete_docs,
    deleted_ids,
    tombstones_path,
)
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.sources.pages import generate_pages
from mini_ivf_ray.state import manifest as mf
from mini_ivf_ray.state.stats import CorpusStats

QUERIES = ["the data", "web page time", "a of", "data data data"]


def _topk(idx, cfg, queries, **kw):
    qds = ray.data.from_items(
        [{"query_id": i, "text": t} for i, t in enumerate(queries)]
    )
    df = search(idx, qds, cfg, share=False, **kw).to_pandas()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _prepared_ids(idx):
    ids = []
    for f in glob.glob(os.path.join(idx, "prepared", "*.parquet")):
        ids.append(pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy())
    return np.sort(np.concatenate(ids).astype(np.uint64))


def _segment_bytes(idx, p):
    path = os.path.join(mf.partition_dir(idx, p), "postings.parquet")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    cfg = PipelineConfig(num_partitions=4)
    pages = generate_pages(400, seed=91, vocab_size=300, dup_frac=0.0)
    idx = str(tmp_path_factory.mktemp("maint") / "idx")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    ids = _prepared_ids(idx)
    # deterministic victim set: every 5th doc id in sorted order
    victims = ids[::5]
    return idx, cfg, pages, ids, victims


def test_delete_masks_search_exactly(built, tmp_path):
    idx, cfg, pages, ids, victims = built
    import shutil

    work = str(tmp_path / "del")
    shutil.copytree(idx, work)

    full = _topk(work, cfg, QUERIES)
    res = delete_docs(work, victims)
    assert res["total_tombstones"] == len(victims)
    assert np.array_equal(deleted_ids(work), np.sort(victims))

    got = _topk(work, cfg, QUERIES)
    # no tombstoned doc in any result
    assert not np.isin(got["doc_id"].to_numpy().astype(np.uint64), victims).any()
    # live-docs semantics: survivors keep their exact pre-delete score
    merged = got.merge(full, on=["query_id", "doc_id"], suffixes=("", "_full"))
    assert (merged["score"] == merged["score_full"]).all()
    # expected ranking == full ranking (huge k) minus victims, re-cut
    big = _topk(work, cfg, QUERIES, respect_deletes=False)
    # ranks must be dense 0..n-1 per query
    for _, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(len(g)))
    # idempotent re-delete
    res2 = delete_docs(work, victims)
    assert res2["new_tombstones"] == 0
    # respect_deletes=False sees the full corpus
    pd.testing.assert_frame_equal(big, full)


def test_delete_unknown_id(built, tmp_path):
    idx, cfg, *_ = built
    import shutil

    work = str(tmp_path / "unk")
    shutil.copytree(idx, work)
    with pytest.raises(KeyError):
        delete_docs(work, [np.uint64(12345)])
    out = delete_docs(work, [np.uint64(12345)], on_missing="ignore")
    assert out["new_tombstones"] == 0 and out["missing"] == 1


def test_compact_equals_fresh_build(built, tmp_path):
    idx, cfg, pages, ids, victims = built
    import shutil

    work = str(tmp_path / "cmp")
    shutil.copytree(idx, work)
    delete_docs(work, victims)
    meta = compact_index(work, cfg)
    assert meta["counters"]["removed_docs"] == len(victims)
    assert deleted_ids(work).size == 0
    assert not os.path.exists(compact_marker_path(work))
    # tombstoned ids physically gone from the prepared corpus
    assert not np.isin(victims, _prepared_ids(work)).any()

    # fresh build over the surviving pages only
    purl = pages["url"].to_numpy(zero_copy_only=False)
    from mini_ivf_ray.functions.hashing import doc_ids_from_urls

    page_ids = doc_ids_from_urls(purl)
    keep = ~np.isin(page_ids, victims)
    fresh = str(tmp_path / "fresh")
    import pyarrow as pa

    build_index(
        lambda: ray.data.from_arrow(pages.filter(pa.array(keep))), fresh, cfg
    )

    sf, sc = CorpusStats.load(fresh), CorpusStats.load(work)
    assert (sf.n_docs, sf.total_tokens, sf.max_doc_id) == (
        sc.n_docs, sc.total_tokens, sc.max_doc_id)
    assert sf.df == sc.df and sf.cf == sc.cf and sf.salted == sc.salted
    for p in range(cfg.num_partitions):
        assert _segment_bytes(fresh, p) == _segment_bytes(work, p), f"part {p}"
    pd.testing.assert_frame_equal(
        _topk(fresh, cfg, QUERIES), _topk(work, cfg, QUERIES)
    )


def test_compact_noop_without_tombstones(built, tmp_path):
    idx, cfg, *_ = built
    import shutil

    work = str(tmp_path / "noop")
    shutil.copytree(idx, work)
    before = mf.read_index_manifest(work)
    out = compact_index(work, cfg)
    assert out == before


def test_compact_resume_after_interrupt(built, tmp_path, monkeypatch):
    idx, cfg, pages, ids, victims = built
    import shutil

    work = str(tmp_path / "resume")
    shutil.copytree(idx, work)
    delete_docs(work, victims)

    import mini_ivf_ray.stages.spimi as spimi

    real = spimi.make_spill_encoder

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before encode")

    monkeypatch.setattr(spimi, "make_spill_encoder", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_index(work, cfg)
    assert os.path.exists(compact_marker_path(work))
    # a mid-compaction index refuses build/append/delete
    with pytest.raises(RuntimeError, match="compact"):
        build_index(lambda: ray.data.from_arrow(pages), work, cfg)
    with pytest.raises(RuntimeError, match="compact"):
        delete_docs(work, victims[:1])

    monkeypatch.setattr(spimi, "make_spill_encoder", real)
    meta = compact_index(work, cfg)
    assert meta["counters"]["removed_docs"] == len(victims)
    got = _topk(work, cfg, QUERIES)
    assert not np.isin(
        got["doc_id"].to_numpy().astype(np.uint64), victims
    ).any()


def test_tombstones_survive_append(built, tmp_path):
    idx, cfg, pages, ids, victims = built
    import shutil

    work = str(tmp_path / "appdel")
    shutil.copytree(idx, work)
    delete_docs(work, victims)
    extra = generate_pages(60, seed=404, vocab_size=300, dup_frac=0.0)
    from mini_ivf_ray.pipelines.append import append_index

    append_index(lambda: ray.data.from_arrow(extra), work, cfg,
                 on_existing="skip")
    assert np.array_equal(deleted_ids(work), np.sort(victims))
    got = _topk(work, cfg, QUERIES)
    assert not np.isin(
        got["doc_id"].to_numpy().astype(np.uint64), victims
    ).any()


def test_delete_by_query_matches_manual_tombstones(tiny_index, tmp_path):
    """delete_by_query == delete_docs over the brute match set; AND
    vs OR modes differ when terms co-occur partially; idempotent."""
    import shutil

    import ray.data
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.maintenance import delete_by_query
    from mini_ivf_ray.pipelines.query import search

    idx, cfg, docs = tiny_index
    toks = {
        int(d): set(tokenize(t))
        for d, t in zip(
            docs["doc_id"].to_numpy().astype(np.uint64), docs["text"]
        )
    }
    for mode, pred in (
        ("or", lambda tk: bool({"data", "web"} & tk)),
        ("and", lambda tk: {"data", "web"} <= tk),
    ):
        idx2 = str(tmp_path / f"dbq_{mode}")
        shutil.copytree(idx, idx2)
        info = delete_by_query(idx2, "data web", cfg, mode=mode)
        want = {d for d, tk in toks.items() if pred(tk)}
        assert info["deleted"] == len(want), mode
        # idempotent
        info2 = delete_by_query(idx2, "data web", cfg, mode=mode)
        assert info2["deleted"] == len(want)
        qds = ray.data.from_items([{"query_id": 0, "text": "the data"}])
        res = search(idx2, qds, cfg).to_pandas()
        got_ids = set(int(x) for x in res["doc_id"].astype(np.uint64))
        assert not (got_ids & want), mode
    # or deletes a strict superset of and (partial co-occurrence)
    n_or = sum(1 for tk in toks.values() if {"data", "web"} & tk)
    n_and = sum(1 for tk in toks.values() if {"data", "web"} <= tk)
    assert n_or > n_and
