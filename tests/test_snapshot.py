"""Index snapshot/restore: byte-identity roundtrip, segment-level
incrementality across an append, point-in-time restore, corruption
detection, torn-snapshot invisibility, restored-search bit-identity."""

import json
import os

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.query import search
from mini_ivf_ray.state.snapshot import (
    list_snapshots,
    restore_index,
    snapshot_index,
    verify_snapshot,
)


def _file_hashes(root):
    from mini_ivf_ray.state.snapshot import _md5_file, _walk_files

    return {r: _md5_file(os.path.join(root, r)) for r in _walk_files(root)}


@pytest.fixture(scope="module")
def snap_env(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(360, seed=43, vocab_size=250, dup_frac=0.0)
    base = tmp_path_factory.mktemp("snapenv")
    idx = str(base / "idx")
    build_index(lambda: ray.data.from_arrow(tbl.slice(0, 300)), idx, cfg)
    repo = str(base / "repo")
    return idx, cfg, repo, str(base), tbl


def test_roundtrip_and_point_in_time(snap_env):
    from mini_ivf_ray.pipelines.append import append_index

    idx, cfg, repo, base, tbl = snap_env
    before = _file_hashes(idx)
    s1 = snapshot_index(idx, repo, "s1")
    assert s1["files"] == len(before) and s1["shared_blobs"] == 0
    assert list_snapshots(repo) == ["s1"]
    assert verify_snapshot(repo, "s1")["bad"] == []

    # mutate the index: incremental append adds new segment files
    append_index(lambda: ray.data.from_arrow(tbl.slice(300)), idx, cfg)
    after = _file_hashes(idx)
    assert after != before
    s2 = snapshot_index(idx, repo, "s2")
    # segment-level incrementality: unchanged immutable files are
    # SHARED blobs, only the appended/updated files are new
    assert s2["shared_blobs"] > 0
    assert s2["new_blobs"] < s2["files"]

    # point-in-time: restoring s1 reproduces the PRE-append bytes
    dest1 = os.path.join(base, "restore1")
    restore_index(repo, "s1", dest1)
    assert _file_hashes(dest1) == before
    dest2 = os.path.join(base, "restore2")
    restore_index(repo, "s2", dest2)
    assert _file_hashes(dest2) == after

    # restored index serves bit-identically to the live one
    qds = ray.data.from_items(
        [{"query_id": 0, "text": "the data web"}]
    )
    live = search(idx, qds, cfg).to_pandas().sort_values("rank")
    rest = search(dest2, qds, cfg).to_pandas().sort_values("rank")
    assert np.array_equal(
        live["doc_id"].to_numpy().astype(np.uint64),
        rest["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(
        live["score"].to_numpy(), rest["score"].to_numpy()
    )


def test_corruption_detected_and_torn_snapshot_invisible(snap_env):
    idx, cfg, repo, base, _ = snap_env
    snapshot_index(idx, repo, "c1")
    m = json.load(open(os.path.join(repo, "snap-c1.json")))
    victim = m["files"][0]["md5"]
    path = os.path.join(repo, "blobs", victim)
    blob = open(path, "rb").read()
    open(path, "wb").write(bytes([blob[0] ^ 0xFF]) + blob[1:])
    audit = verify_snapshot(repo, "c1")
    assert audit["bad"], "corruption must be flagged"
    with pytest.raises(RuntimeError, match="failed verification"):
        restore_index(repo, "c1", os.path.join(base, "nope"))
    assert not os.path.exists(os.path.join(base, "nope"))
    open(path, "wb").write(blob)  # heal for other tests
    assert verify_snapshot(repo, "c1")["bad"] == []

    # a torn snapshot (blobs landed, manifest missing) is invisible
    assert "torn" not in list_snapshots(repo)
    with pytest.raises(FileNotFoundError):
        restore_index(repo, "torn", os.path.join(base, "nope2"))

    # contracts
    with pytest.raises(FileExistsError):
        snapshot_index(idx, repo, "c1")
    with pytest.raises(ValueError, match="bad snapshot name"):
        snapshot_index(idx, repo, "a/b")
    with pytest.raises(FileExistsError):
        restore_index(repo, "c1", idx)


def test_disk_usage_accounting(snap_env):
    """_disk_usage analog: per-term payload bytes reconcile with a
    direct pyarrow scan; n_postings == dictionary df; component totals
    bound the payload sum; contracts."""
    import glob

    import pyarrow.parquet as pq

    from mini_ivf_ray.pipelines.diskusage import (
        component_bytes,
        term_disk_usage,
    )

    idx, cfg, repo, base, _ = snap_env
    top = term_disk_usage(idx, cfg, top_n=10_000)  # untruncated
    # direct reference scan
    ref_bytes: dict[str, int] = {}
    ref_posts: dict[str, int] = {}
    ref_blocks: dict[str, int] = {}
    for f in glob.glob(os.path.join(idx, "segments", "part=*", "*.parquet")):
        t = pq.read_table(f, columns=["term", "count", "payload"])
        for term, cnt, pay in zip(
            t["term"].to_pylist(), t["count"].to_pylist(),
            t["payload"].to_pylist(),
        ):
            ref_bytes[term] = ref_bytes.get(term, 0) + len(pay)
            ref_posts[term] = ref_posts.get(term, 0) + int(cnt)
            ref_blocks[term] = ref_blocks.get(term, 0) + 1
    assert len(top) == len(ref_bytes)
    for term, b, k, p in zip(
        top["term"].to_pylist(), top["payload_bytes"].to_pylist(),
        top["n_blocks"].to_pylist(), top["n_postings"].to_pylist(),
    ):
        assert ref_bytes[term] == b, term
        assert ref_blocks[term] == k, term
        assert ref_posts[term] == p, term
    # the ordering contract: (payload_bytes desc, term asc)
    rows = list(
        zip(top["payload_bytes"].to_pylist(), top["term"].to_pylist())
    )
    assert rows == sorted(rows, key=lambda x: (-x[0], x[1]))
    # dictionary df bookkeeping agrees
    d = pq.read_table(
        os.path.join(idx, "dictionary.parquet"), columns=["term", "df"]
    )
    df_map = dict(zip(d["term"].to_pylist(), d["df"].to_pylist()))
    for term, p in zip(
        top["term"].to_pylist(), top["n_postings"].to_pylist()
    ):
        assert df_map[term] == p
    comp = component_bytes(idx)
    # payload_bytes is the CODEC-output size; parquet page compression
    # can put the FILE below it — both layers must simply be positive
    # and the component walk must cover the segments
    assert comp["segments"] > 0
    assert sum(ref_bytes.values()) > 0
    assert comp["dictionary"] > 0 and comp["manifest"] > 0
    with pytest.raises(ValueError, match="top_n"):
        term_disk_usage(idx, cfg, top_n=0)
    with pytest.raises(FileNotFoundError):
        term_disk_usage(os.path.join(base, "nowhere"), cfg)


def test_delete_and_gc(snap_env, tmp_path_factory):
    """Snapshot deletion + repository GC: shared blobs survive while
    any referencing snapshot lives, orphans (and torn .tmp copies)
    are reclaimed, and the surviving snapshot still restores
    byte-identically after GC."""
    from mini_ivf_ray.state.snapshot import (
        delete_snapshot,
        gc_repository,
    )

    idx, cfg, _, base, _ = snap_env
    repo = str(tmp_path_factory.mktemp("gcrepo"))
    before = _file_hashes(idx)
    snapshot_index(idx, repo, "a")
    snapshot_index(idx, repo, "b")  # fully shared with a
    n_blobs = len(os.listdir(os.path.join(repo, "blobs")))
    # plant a torn copy
    open(os.path.join(repo, "blobs", "deadbeef.tmp"), "wb").write(b"x")

    delete_snapshot(repo, "b")
    assert list_snapshots(repo) == ["a"]
    stats = gc_repository(repo)
    # everything is still referenced by a; only the torn copy goes
    assert stats["kept"] == n_blobs and stats["removed"] == 1
    dest = os.path.join(base, "gc_restore")
    restore_index(repo, "a", dest)
    assert _file_hashes(dest) == before

    delete_snapshot(repo, "a")
    stats = gc_repository(repo)
    assert stats["kept"] == 0 and stats["removed"] == n_blobs
    assert os.listdir(os.path.join(repo, "blobs")) == []
    with pytest.raises(FileNotFoundError):
        delete_snapshot(repo, "a")
    # gc on a repo with no blob dir is a no-op
    empty = str(tmp_path_factory.mktemp("gcempty"))
    assert gc_repository(empty) == {
        "kept": 0, "removed": 0, "removed_bytes": 0,
    }


def test_parallel_fanout_paths(snap_env, tmp_path_factory, monkeypatch):
    """Force the Ray-task fan-out (hash + copy) by dropping the
    parallelism threshold to 1: snapshot and restore must produce the
    identical byte set through the parallel path."""
    from mini_ivf_ray.state import snapshot as snap

    idx, cfg, _, base, _ = snap_env
    monkeypatch.setattr(snap, "_PARALLEL_MIN", 1)
    repo = str(tmp_path_factory.mktemp("parrepo"))
    s = snap.snapshot_index(idx, repo, "par")
    assert s["new_blobs"] > 0
    dest = os.path.join(base, "par_restore")
    snap.restore_index(repo, "par", dest)
    assert _file_hashes(dest) == _file_hashes(idx)
