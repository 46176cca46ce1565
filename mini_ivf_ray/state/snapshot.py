"""Index snapshot & restore — the Elasticsearch snapshot/restore API
analog over a content-addressed snapshot REPOSITORY.

Layout of a repository directory:

    repo/
      blobs/<md5>           one blob per distinct file CONTENT
      snap-<name>.json      snapshot manifest: [(relpath, md5, size)]

Properties, pinned by tests:

  * **Incremental by segment** (ES's behavior, for ES's reason): the
    engine's segment files are immutable — an incremental append adds
    NEW per-partition files and compaction rewrites them, but existing
    blobs never change — so successive snapshots of a growing index
    re-store only the new/changed files; unchanged content is shared
    through the blob store by md5.
  * **Atomic**: the snapshot manifest is written tmp + rename AFTER
    every blob has landed; a torn snapshot (crash mid-copy) leaves
    only orphan blobs, never a listed-but-incomplete snapshot.
    Restore likewise materializes into a temp dir and renames.
  * **Verified**: restore re-hashes every blob before install
    (``verify=False`` to skip); ``verify_snapshot`` audits a snapshot
    in place.  A corrupted blob fails loudly with the offending path.
  * **Point-in-time**: restoring snap A after later snapshots /
    appends reproduces A's file set byte-for-byte.

Scale shape: blobs are independent, so hashing + copying fan out as
plain Ray tasks when a session is live and the file count warrants it
(``_PARALLEL_MIN``); the repository itself is just files, so at real
scale it lives on the shared store the index already uses.  Snapshot
cost is proportional to NEW content, restore to the snapshot size.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

_PARALLEL_MIN = 16


def _md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for base, _, names in os.walk(root):
        for n in names:
            out.append(
                os.path.relpath(os.path.join(base, n), root)
            )
    return sorted(out)


def _use_ray(n: int) -> bool:
    try:
        import ray

        return ray.is_initialized() and n >= _PARALLEL_MIN
    except Exception:  # pragma: no cover - ray always importable here
        return False


def _hash_many(root: str, rels: list[str]) -> list[str]:
    """md5 per file — Ray-parallel above _PARALLEL_MIN files."""
    paths = [os.path.join(root, r) for r in rels]
    if not _use_ray(len(paths)):
        return [_md5_file(p) for p in paths]
    import ray

    @ray.remote(num_cpus=0.25)
    def h(p):
        return _md5_file(p)

    return ray.get([h.remote(p) for p in paths])


def _copy_atomic(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".tmp"
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


def _copy_many(pairs: list[tuple[str, str]]) -> None:
    """Atomic (tmp + rename) copies — Ray-parallel above
    _PARALLEL_MIN files; blobs/files are independent so the fan-out
    is embarrassingly parallel."""
    if not _use_ray(len(pairs)):
        for src, dst in pairs:
            _copy_atomic(src, dst)
        return
    import ray

    @ray.remote(num_cpus=0.25)
    def c(src, dst):
        _copy_atomic(src, dst)

    ray.get([c.remote(s, d) for s, d in pairs])


def snapshot_index(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot ``index_dir`` into the repository as ``name``.
    Returns {files, bytes, new_blobs, shared_blobs}."""
    if not name or "/" in name or name.startswith("snap-"):
        raise ValueError(f"bad snapshot name {name!r}")
    mpath = os.path.join(repo_dir, f"snap-{name}.json")
    if os.path.exists(mpath):
        raise FileExistsError(f"snapshot {name!r} already exists")
    blob_dir = os.path.join(repo_dir, "blobs")
    os.makedirs(blob_dir, exist_ok=True)
    rels = _walk_files(index_dir)
    if not rels:
        raise ValueError(f"nothing to snapshot under {index_dir}")
    hashes = _hash_many(index_dir, rels)
    entries, shared, total = [], 0, 0
    to_copy: dict[str, str] = {}  # blob path -> src (dedup identical content)
    for rel, md5 in zip(rels, hashes):
        src = os.path.join(index_dir, rel)
        size = os.path.getsize(src)
        total += size
        blob = os.path.join(blob_dir, md5)
        if os.path.exists(blob) or blob in to_copy:
            shared += 1
        else:
            to_copy[blob] = src
        entries.append({"path": rel, "md5": md5, "size": size})
    _copy_many([(src, blob) for blob, src in to_copy.items()])
    new = len(to_copy)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"name": name, "files": entries}, f, indent=1)
    os.replace(tmp, mpath)  # the commit point
    return {
        "files": len(entries),
        "bytes": total,
        "new_blobs": new,
        "shared_blobs": shared,
    }


def list_snapshots(repo_dir: str) -> list[str]:
    if not os.path.isdir(repo_dir):
        return []
    return sorted(
        f[len("snap-"):-len(".json")]
        for f in os.listdir(repo_dir)
        if f.startswith("snap-") and f.endswith(".json")
    )


def _load_manifest(repo_dir: str, name: str) -> list[dict]:
    mpath = os.path.join(repo_dir, f"snap-{name}.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    with open(mpath) as f:
        return json.load(f)["files"]


def verify_snapshot(repo_dir: str, name: str) -> dict:
    """Re-hash every referenced blob; returns {files, bad} with the
    offending relpaths in ``bad``."""
    files = _load_manifest(repo_dir, name)
    blob_dir = os.path.join(repo_dir, "blobs")
    rels = [e["md5"] for e in files]
    bad = []
    present = [
        os.path.exists(os.path.join(blob_dir, m)) for m in rels
    ]
    got = _hash_many(
        blob_dir, [m for m, ok in zip(rels, present) if ok]
    )
    it = iter(got)
    for e, ok in zip(files, present):
        if not ok or next(it) != e["md5"]:
            bad.append(e["path"])
    return {"files": len(files), "bad": bad}


def restore_index(
    repo_dir: str, name: str, dest_dir: str, verify: bool = True
) -> dict:
    """Materialize snapshot ``name`` at ``dest_dir`` (must not exist).
    With ``verify`` every blob is re-hashed first; a mismatch raises
    before anything is installed.  Install is tmp-dir + rename."""
    files = _load_manifest(repo_dir, name)
    if os.path.exists(dest_dir):
        raise FileExistsError(f"restore target {dest_dir} exists")
    if verify:
        audit = verify_snapshot(repo_dir, name)
        if audit["bad"]:
            raise RuntimeError(
                f"snapshot {name!r} failed verification: "
                f"{audit['bad'][:5]}{'...' if len(audit['bad']) > 5 else ''}"
            )
    blob_dir = os.path.join(repo_dir, "blobs")
    tmp = dest_dir.rstrip("/") + ".restoring"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        _copy_many(
            [
                (os.path.join(blob_dir, e["md5"]), os.path.join(tmp, e["path"]))
                for e in files
            ]
        )
        os.replace(tmp, dest_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"files": len(files), "bytes": sum(e["size"] for e in files)}


def delete_snapshot(repo_dir: str, name: str) -> None:
    """Remove a snapshot's manifest.  Blobs are left in place — they
    may be shared with other snapshots; reclaim space with
    ``gc_repository`` (ES's snapshot-delete + cleanup split)."""
    mpath = os.path.join(repo_dir, f"snap-{name}.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    os.remove(mpath)


def gc_repository(repo_dir: str) -> dict:
    """Delete every blob referenced by NO remaining snapshot manifest.
    Returns {kept, removed, removed_bytes}.  Safe with concurrent
    snapshot CREATION only if callers serialize gc against snapshot
    (the ES repository-cleanup contract); a torn snapshot's orphan
    blobs are exactly what this reclaims."""
    blob_dir = os.path.join(repo_dir, "blobs")
    if not os.path.isdir(blob_dir):
        return {"kept": 0, "removed": 0, "removed_bytes": 0}
    live: set[str] = set()
    for name in list_snapshots(repo_dir):
        for e in _load_manifest(repo_dir, name):
            live.add(e["md5"])
    kept = removed = removed_bytes = 0
    for b in os.listdir(blob_dir):
        if b.endswith(".tmp"):
            # a torn copy: never referenced, always reclaimable
            path = os.path.join(blob_dir, b)
            removed_bytes += os.path.getsize(path)
            os.remove(path)
            removed += 1
            continue
        if b in live:
            kept += 1
        else:
            path = os.path.join(blob_dir, b)
            removed_bytes += os.path.getsize(path)
            os.remove(path)
            removed += 1
    return {"kept": kept, "removed": removed, "removed_bytes": removed_bytes}
