"""Resume semantics (north_rule: interrupted build recomputes no
committed partition; reference analog: LoadFromBook set-difference,
index_ivfpq.cpp:122-159, and FIXTURES.md §4)."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.sources.pages import generate_pages
from mini_ivf_ray.state import manifest as mf


def _segment_bytes(idx, p):
    with open(os.path.join(mf.partition_dir(idx, p), "postings.parquet"), "rb") as f:
        return f.read()


def test_resume_skips_committed_partitions(tmp_path):
    cfg = PipelineConfig(num_partitions=4)
    pages = generate_pages(400, seed=23, vocab_size=300)
    clean = str(tmp_path / "clean")
    build_index(lambda: ray.data.from_arrow(pages), clean, cfg)

    # interrupted copy: drop index manifest + partitions 1 and 3
    broken = str(tmp_path / "broken")
    shutil.copytree(clean, broken)
    os.remove(os.path.join(broken, "manifest.json"))
    for p in (1, 3):
        shutil.rmtree(mf.partition_dir(broken, p))
    assert mf.pending_partitions(broken, 4) == {1, 3}

    kept_before = {p: os.path.getmtime(mf.partition_manifest_path(broken, p)) for p in (0, 2)}
    meta = build_index(lambda: ray.data.from_arrow(pages), broken, cfg)
    assert meta["counters"]["partitions_built_this_run"] == 2
    # committed partitions untouched
    for p in (0, 2):
        assert os.path.getmtime(mf.partition_manifest_path(broken, p)) == kept_before[p]

    # resumed index == clean index, byte-for-byte per segment
    for p in range(4):
        assert _segment_bytes(clean, p) == _segment_bytes(broken, p)


def test_leftover_tmp_and_uncommitted_dir_rebuilt(tmp_path):
    """A partition dir without manifest.json (crash between rename and
    manifest write) is garbage and gets rebuilt."""
    cfg = PipelineConfig(num_partitions=2)
    pages = generate_pages(150, seed=29, vocab_size=100)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    ref0 = _segment_bytes(idx, 0)

    os.remove(os.path.join(idx, "manifest.json"))
    os.remove(mf.partition_manifest_path(idx, 0))  # simulate torn commit
    assert mf.pending_partitions(idx, 2) == {0}
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    assert _segment_bytes(idx, 0) == ref0


def test_interrupted_spill_discarded(tmp_path):
    """Garbage run files from a killed spill pass must not leak into the
    rebuilt segments (stale runs would duplicate postings)."""
    import pyarrow as pa
    import pyarrow.parquet as pqm

    cfg = PipelineConfig(num_partitions=2)
    pages = generate_pages(150, seed=33, vocab_size=100)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    ref = {p: _segment_bytes(idx, p) for p in range(2)}

    os.remove(os.path.join(idx, "manifest.json"))
    for p in range(2):
        shutil.rmtree(mf.partition_dir(idx, p))
    # simulate an interrupted spill: leftover run with bogus postings
    os.makedirs(os.path.join(idx, "spill", "pid=0"), exist_ok=True)
    bogus = pa.table(
        {
            "term": pa.array(["zzz"]),
            "doc_id": pa.array([1], type=pa.uint64()),
            "tf": pa.array([1], type=pa.int64()),
            "dl": pa.array([1], type=pa.int64()),
        }
    )
    pqm.write_table(bogus, os.path.join(idx, "spill", "pid=0", "run_1_1.parquet"))
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    for p in range(2):
        assert _segment_bytes(idx, p) == ref[p]


def test_stats_checkpoint_reused(tmp_path, monkeypatch):
    """Second run with stats sidecar present must replay the persisted
    salt plan verbatim — never re-estimate (committed partitions were
    scored under it)."""
    cfg = PipelineConfig(num_partitions=2)
    pages = generate_pages(150, seed=31, vocab_size=100)
    idx = str(tmp_path / "idx")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)

    os.remove(os.path.join(idx, "manifest.json"))
    shutil.rmtree(mf.partition_dir(idx, 1))

    import mini_ivf_ray.pipelines.build as build_mod

    def boom(*a, **k):
        raise AssertionError("salt plan re-estimated despite checkpoint")

    monkeypatch.setattr(build_mod, "_estimate_salt_plan", boom)
    meta = build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    assert meta["counters"]["partitions_built_this_run"] == 1


def test_multilevel_merge_byte_identical(tmp_path):
    """Forcing a tiny merge fan-in (multi-level external merge) must
    produce byte-identical segments to the single-level path — the
    10^5-runs-per-partition scale configuration changes only memory
    shape, never bytes."""
    import glob

    import pyarrow as pa

    import ray.data
    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.stages.spimi import (
        make_spill_encoder,
        make_spill_fn,
        scan_spill_runs,
    )

    cfg = PipelineConfig(num_partitions=2, spill_batch_size=64)
    pages = generate_pages(300, seed=61, vocab_size=150)
    from mini_ivf_ray.stages.prepare import prepare_documents

    docs = prepare_documents(ray.data.from_arrow(pages), cfg).materialize()
    spill = str(tmp_path / "spill")
    docs.map_batches(
        make_spill_fn({}, cfg, 2**64, spill, [0, 1]),
        batch_format="pyarrow",
        batch_size=32,  # many tiny runs
        num_cpus=1,
    ).count()
    run_map = scan_spill_runs(spill)
    n_runs = len(glob.glob(spill + "/run_*.parquet"))
    assert n_runs > 6
    outs = {}
    for name, fanin in (("one_level", 10_000), ("multi_level", 3)):
        idx = str(tmp_path / name)
        os.makedirs(idx)
        enc = make_spill_encoder(
            spill, run_map, idx, 300, 50.0, {}, {}, cfg, {}, 2**64,
            merge_fanin=fanin,
        )
        enc(pa.table({"pid": pa.array([0, 1])}))
        outs[name] = {p: _segment_bytes(idx, p) for p in (0, 1)}
    assert outs["one_level"] == outs["multi_level"]
