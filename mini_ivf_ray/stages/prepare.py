"""Document preparation: extract -> dedup -> docID assignment.

Pipeline position: the first stages of the build, before any postings
exist.  All stateless ``map_batches`` over Arrow batches plus ONE
``groupby(url)`` shuffle for exact url-dedup.

Reference analogs: text extraction has none (input_hint addition,
SURVEY M6); docID assignment replaces positional row ids
(index_ivf.cpp:86-92); dedup is SURVEY §2.7's addition (docID = f(url)
must be unique, so pages are deduped last-write-wins by warc_ts first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.extract import extract_text
from mini_ivf_ray.functions.hashing import doc_ids_from_urls


def extract_batch(batch: pa.Table) -> pa.Table:
    """html binary -> extracted text (the pinned extractor).  Keeps only
    the columns the build needs — html is dropped here so the url-dedup
    shuffle never moves the heavy binary payloads."""
    texts = [extract_text(h) for h in batch["html"].to_pylist()]
    cols = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "text": pa.array(texts, type=pa.string()),
    }
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch["doc_id"]
    return pa.table(cols)


def _keep_latest(group: pa.Table) -> pa.Table:
    """Within one bucket keep, per url, the row with max (warc_ts, text):
    last-write-wins, deterministic under exact-ts ties."""
    order = pc.sort_indices(
        group,
        sort_keys=[("url", "ascending"), ("warc_ts", "descending"), ("text", "descending")],
    )
    urls = group.column("url").take(order).to_numpy(zero_copy_only=False)
    mask = np.ones(len(order), dtype=bool)
    mask[1:] = urls[1:] != urls[:-1]
    out = group.take(order.to_numpy(zero_copy_only=False)[mask])
    # docID-collision check (doc_id = md5-u64(url)): colliding ids always
    # land in the same bucket (bucket = doc_id % B), so per-bucket
    # uniqueness after url-dedup is a COMPLETE global check — two distinct
    # urls hashing to one doc_id would silently merge into one identity.
    kept_ids = out.column("doc_id").to_numpy(zero_copy_only=False)
    if np.unique(kept_ids).size != len(out):
        s = np.sort(kept_ids)
        bad = s[1:][s[1:] == s[:-1]][0]
        raise ValueError(
            f"docID hash collision: distinct urls share doc_id {int(bad)}"
        )
    return out.drop_columns(["bucket"]) if "bucket" in out.column_names else out


def dedup_by_url(ds, num_buckets: int = 64):
    """Exact dedup: one row per url, last-write-wins by warc_ts.

    Hash-BUCKETED groupby, not groupby(url): a per-url grouping would
    emit one tiny block per url (an O(N)-groups map_groups antipattern —
    at web scale that is 10^12 one-row blocks).  Buckets come from the
    already-computed doc_id = md5(url), so rows of one url always share
    a bucket; within a bucket the dedup is one vectorized sort+mask."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["doc_id"].to_numpy() % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(max(8, n_cpus))  # cheap coalesce before the exchange
        .groupby("bucket")
        .map_groups(_keep_latest, batch_format="pyarrow")
    )


def assign_doc_ids(ds, cfg: PipelineConfig):
    """doc_id = md5-u64(url) (stable across runs and block orders).
    Collisions are detected in the dedup shuffle (``_keep_latest``:
    per-bucket doc_id uniqueness after url-dedup)."""
    if not cfg.doc_id_from_url:
        # input carries doc_id already (driver's documents table): cast
        def cast(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.column_names.index("doc_id"),
                "doc_id",
                pc.cast(batch["doc_id"], pa.uint64()),
            )

        return ds.map_batches(cast, batch_format="pyarrow")

    def add_ids(batch: pa.Table) -> pa.Table:
        ids = doc_ids_from_urls(batch["url"].to_pylist())
        if "doc_id" in batch.column_names:
            batch = batch.drop_columns(["doc_id"])
        return batch.append_column("doc_id", pa.array(ids, type=pa.uint64()))

    return ds.map_batches(add_ids, batch_format="pyarrow")


def dedup_written_files(prep_dir: str, driver_id_limit: int = 50_000_000) -> int:
    """Optimistic exact dedup over ALREADY-WRITTEN prepared files — the
    increment path (pipelines/append.py).  An increment is usually
    pre-deduped upstream (a crawl frontier emits each url once), so the
    common case pays ONE slim doc_id-column scan and no shuffle at all,
    vs the build's bucketed groupby exchange whose flat latency floor
    dominates a small increment (memory pitfalls #4/#12).

    1. scan every file's doc_id column (slim; ids ≤ ``driver_id_limit``
       stay driver-side, above it fall back to the exchange dedup)
    2. no duplicated id -> done (zero extra IO)
    3. else: filtered-read ONLY the duplicated ids' rows, pick winners
       with the exact same rule as the build (``_keep_latest``:
       last-write-wins by (warc_ts, text), docID-collision raise),
       rewrite the affected files without the dup rows, and write the
       winners as one extra file.  Cost ∝ duplicates.

    Returns the number of duplicate rows removed.  Segment byte-identity
    vs a fresh build is unaffected: the encoder consumes the sorted
    (term, doc) stream, which does not depend on prepared-file layout.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(prep_dir, "*.parquet")))
    if not files:
        return 0
    id_cols = [
        pq.read_table(f, columns=["doc_id"])["doc_id"]
        .to_numpy()
        .astype(np.uint64)
        for f in files
    ]
    total = int(sum(a.size for a in id_cols))
    if total > driver_id_limit:
        # huge increment: the exchange dedup amortizes — rewrite via it
        import ray.data

        ds = dedup_by_url(ray.data.read_parquet(files))
        tmp = prep_dir + "_dedup.tmp"
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ds.write_parquet(tmp)
        for f in files:
            os.remove(f)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            os.replace(
                os.path.join(tmp, f),
                os.path.join(prep_dir, f"dedup_{i:05d}.parquet"),
            )
        _sh.rmtree(tmp, ignore_errors=True)
        new_total = sum(
            pq.ParquetFile(os.path.join(prep_dir, f)).metadata.num_rows
            for f in os.listdir(prep_dir)
            if f.endswith(".parquet")
        )
        return total - int(new_total)

    all_ids = np.concatenate(id_cols)
    s = np.sort(all_ids)
    dup_ids = np.unique(s[1:][s[1:] == s[:-1]])
    if dup_ids.size == 0:
        return 0

    dup_tables = []
    for f, ids in zip(files, id_cols):
        pos = np.minimum(np.searchsorted(dup_ids, ids), dup_ids.size - 1)
        hit = dup_ids[pos] == ids
        if not hit.any():
            continue
        t = pq.read_table(f)
        dup_tables.append((f, t, hit))
    import pyarrow as _pa

    winners = _keep_latest(
        _pa.concat_tables([t.filter(_pa.array(h)) for _, t, h in dup_tables])
    )
    removed = sum(int(h.sum()) for _, _, h in dup_tables) - winners.num_rows
    for f, t, hit in dup_tables:
        pq.write_table(t.filter(_pa.array(~hit)), f + ".tmp")
        os.replace(f + ".tmp", f)
    wpath = os.path.join(prep_dir, "zzz_dedup_winners.parquet")
    pq.write_table(winners, wpath + ".tmp")
    os.replace(wpath + ".tmp", wpath)
    return removed


def prepare_documents(pages_ds, cfg: PipelineConfig, dedup: bool = True):
    """pages -> deduped (url, warc_ts, text, doc_id) Dataset.  docIDs are
    assigned BEFORE dedup so the dedup shuffle can bucket on them."""
    ds = pages_ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
    )
    ds = assign_doc_ids(ds, cfg)
    if dedup and cfg.doc_id_from_url:
        ds = dedup_by_url(ds)
    return ds
