"""Per-partition manifests: checkpoint / resume with lineage + counters.

Reference analog: the per-cluster shard layout — one ``pqcode_<no>.ui8vecs``
+ ``id_<no>.uivecs`` per posting list plus a global ``posting_lists_lens``
(index_ivfpq.cpp:496-530) — and ``LoadFromBook``'s partition-selective
load / set-difference planning (index_ivfpq.cpp:122-159).

Layout under ``index_dir``::

    stats.json / stats.parquet            corpus statistics ("codebook")
    segments/part=<p>/postings.parquet    block rows for partition p
    segments/part=<p>/manifest.json       per-partition commit marker:
                                          {partition, n_terms, n_postings,
                                           n_blocks, lineage, wall_sec}
    manifest.json                         index-level commit: config,
                                          partitions, totals, lineage

Commits are atomic (write tmp, ``os.replace``).  A partition directory
without its manifest.json is garbage from an interrupted run and is
rebuilt.  The resume planner is the "book" set difference: wanted
partitions minus committed partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any


def partition_dir(index_dir: str, p: int) -> str:
    return os.path.join(index_dir, "segments", f"part={p}")


def partition_manifest_path(index_dir: str, p: int) -> str:
    return os.path.join(partition_dir(index_dir, p), "manifest.json")


def committed_partitions(index_dir: str, num_partitions: int) -> set[int]:
    """The 'book' of completed partitions (J4 analog)."""
    done = set()
    for p in range(num_partitions):
        if os.path.exists(partition_manifest_path(index_dir, p)):
            done.add(p)
    return done


def pending_partitions(index_dir: str, num_partitions: int) -> set[int]:
    return set(range(num_partitions)) - committed_partitions(index_dir, num_partitions)


def commit_partition(
    index_dir: str, p: int, payload_writer, counters: dict[str, Any], lineage: dict[str, Any]
) -> dict[str, Any]:
    """Atomically write one partition segment.

    ``payload_writer(tmp_dir)`` writes the partition's data files into a
    temp dir; the temp dir is then renamed over the final partition dir
    and manifest.json is written last (its presence == committed).
    """
    final = partition_dir(index_dir, p)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    payload_writer(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)  # leftover uncommitted garbage
    os.replace(tmp, final)
    manifest = {
        "partition": p,
        "counters": counters,
        "lineage": lineage,
        "wall_sec": round(time.perf_counter() - t0, 4),
        "committed_at": time.time(),
    }
    mtmp = os.path.join(final, "_manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, partition_manifest_path(index_dir, p))
    return manifest


def read_partition_manifest(index_dir: str, p: int) -> dict[str, Any]:
    with open(partition_manifest_path(index_dir, p)) as f:
        return json.load(f)


def commit_partition_segment(
    index_dir: str,
    p: int,
    filename: str,
    payload_writer,
    counters: dict[str, Any],
    lineage_update: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Atomically ADD one segment file to a (possibly already committed)
    partition — the incremental-append commit (pipelines/append.py
    mode="incremental"), vs ``commit_partition`` which replaces the
    whole directory.

    ``payload_writer(tmp_path)`` writes the file; it is then renamed to
    ``filename`` and the partition manifest merges the new counters and
    records the epoch under ``lineage.epochs[filename]`` — whose
    presence is the resume marker (a crash between the file rename and
    the manifest write re-encodes an identical file, so the replay is
    idempotent)."""
    final_dir = partition_dir(index_dir, p)
    os.makedirs(final_dir, exist_ok=True)
    t0 = time.perf_counter()
    tmp = os.path.join(final_dir, "_" + filename + ".tmp")
    payload_writer(tmp)
    os.replace(tmp, os.path.join(final_dir, filename))
    try:
        manifest = read_partition_manifest(index_dir, p)
    except FileNotFoundError:
        manifest = {"partition": p, "counters": {}, "lineage": {}}
    merged = dict(manifest.get("counters", {}))
    for k, v in counters.items():
        merged[k] = merged.get(k, 0) + v if isinstance(v, (int, float)) else v
    manifest["counters"] = merged
    lineage = dict(manifest.get("lineage", {}))
    epochs = dict(lineage.get("epochs", {}))
    epochs[filename] = dict(counters)
    lineage["epochs"] = epochs
    lineage.update(lineage_update or {})
    manifest["lineage"] = lineage
    manifest["wall_sec"] = round(time.perf_counter() - t0, 4)
    manifest["committed_at"] = time.time()
    mtmp = os.path.join(final_dir, "_manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, partition_manifest_path(index_dir, p))
    return manifest


def partition_segment_committed(index_dir: str, p: int, filename: str) -> dict | None:
    """The epoch counters recorded for ``filename`` in partition ``p``'s
    manifest, or None if that segment file was never committed."""
    try:
        manifest = read_partition_manifest(index_dir, p)
    except FileNotFoundError:
        return None
    return manifest.get("lineage", {}).get("epochs", {}).get(filename)


def commit_index(index_dir: str, meta: dict[str, Any]) -> None:
    tmp = os.path.join(index_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))


def read_index_manifest(index_dir: str) -> dict[str, Any] | None:
    path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def index_is_committed(index_dir: str) -> bool:
    return read_index_manifest(index_dir) is not None
