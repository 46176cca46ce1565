"""Index build pipeline: pages -> segments, checkpointed + resumable.

Lifecycle mirrors the reference's E1/E2 traces (SURVEY §3):

  1. prepare   extract html -> text, url-dedup, docID assignment
               (reference: LoadFromFileBinary + positional ids)
  2. stats     corpus statistics pass = "Train" (index_ivf.cpp:39-70),
               checkpointed as the stats sidecar ("codebook",
               quantizer.cpp:108-131)
  3. populate  tokenize -> salted partition shuffle -> per-partition
               block encode + atomic segment commit
               (reference: Populate/InsertIvf + WriteClusterVector/Id,
               index_ivfpq.cpp:83-120, 496-530)
  4. commit    index-level manifest (reference: Finalize,
               index_ivfpq.cpp:532-546)

Resume (north_rule): stats sidecar present -> skip stats; per-partition
manifest present -> postings for that partition are FILTERED OUT BEFORE
the shuffle (the LoadFromBook set-difference, index_ivfpq.cpp:140-154),
so a rerun neither recomputes nor re-shuffles committed partitions.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.stages.prepare import prepare_documents
from mini_ivf_ray.stages.spimi import (
    TokenizeSpill,
    make_partition_encoder,
    make_spill_encoder,
)
from mini_ivf_ray.stages.stats_stage import compute_stats
from mini_ivf_ray.state import manifest as mf
from mini_ivf_ray.state.stats import CorpusStats


def build_index(
    docs_ds_factory,
    index_dir: str,
    cfg: PipelineConfig | None = None,
    dedup: bool = True,
    lineage_extra: dict | None = None,
) -> dict:
    """Build (or resume building) an index.

    ``docs_ds_factory() -> Dataset`` of pages rows; a factory (not a
    Dataset) so each pass re-reads lazily from source instead of holding
    a materialized Dataset across passes.

    Returns the index manifest dict.
    """
    import ray

    cfg = cfg or PipelineConfig()
    existing = mf.read_index_manifest(index_dir)
    if existing is not None:
        return existing

    t0 = time.perf_counter()
    lineage = {
        "builder": "mini_ivf_ray.build_index",
        "config": {
            "num_partitions": cfg.num_partitions,
            "block_size": cfg.block_size,
            "k1": cfg.k1,
            "b": cfg.b,
            "hot_df_threshold": cfg.hot_df_threshold,
        },
        **(lineage_extra or {}),
    }

    # ---- stage 1: prepare (extract -> dedup -> docID), checkpointed ----
    # Staged to Parquet once: both the stats pass and the populate pass
    # read the slim (doc_id, text) table instead of re-running the
    # extract + dedup shuffle; the staged table doubles as the
    # docID <-> url sidecar (SURVEY §7.3).
    import os

    import ray.data

    prep_dir = os.path.join(index_dir, "prepared")
    prep_marker = os.path.join(prep_dir, "_DONE")
    prepare_wall = 0.0
    if not os.path.exists(prep_marker):
        ts = time.perf_counter()
        os.makedirs(index_dir, exist_ok=True)
        tmp = prep_dir + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        docs = prepare_documents(docs_ds_factory(), cfg, dedup=dedup)
        os.makedirs(tmp, exist_ok=True)  # empty input writes no files
        docs.write_parquet(tmp)
        if os.path.exists(prep_dir):
            import shutil

            shutil.rmtree(prep_dir)
        os.replace(tmp, prep_dir)
        with open(prep_marker, "w") as f:
            f.write("ok")
        prepare_wall = time.perf_counter() - ts

    # CPU-heavy Python transforms need blocks ~ a few x cluster CPUs;
    # the prepared table is small on disk (text compresses well), so the
    # default size-based splitting would yield 1-2 blocks and serialize
    # the whole tokenize pipeline on 2 tasks.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    read_blocks = max(64, 4 * n_cpus)

    corpus_is_empty = not any(
        f.endswith(".parquet") for f in os.listdir(prep_dir)
    )

    def prepared_docs():
        return ray.data.read_parquet(
            prep_dir, columns=["doc_id", "text"], override_num_blocks=read_blocks
        )

    # ---- stage 2: stats (checkpointed) ---------------------------------
    if CorpusStats.exists(index_dir):
        stats = CorpusStats.load(index_dir)
        stats_wall = 0.0
    elif corpus_is_empty:
        stats = CorpusStats(n_docs=0, total_tokens=0)
        stats.save(index_dir)
        stats_wall = 0.0
    else:
        ts = time.perf_counter()
        # large batches: each batch emits ~vocab partial rows, so the
        # term-groupby shuffle volume is n_batches x vocab
        stats = compute_stats(prepared_docs(), batch_size=cfg.spill_batch_size)
        stats.save(index_dir)
        stats_wall = time.perf_counter() - ts

    # ---- stage 3: populate pending partitions --------------------------
    pending = sorted(mf.pending_partitions(index_dir, cfg.num_partitions))
    if corpus_is_empty:
        pending = []
    populate_wall = 0.0
    if pending:
        import shutil

        ts = time.perf_counter()
        stats_ref = ray.put(stats)
        doc_id_space = 2**64 if cfg.doc_id_from_url else stats.max_doc_id + 1
        # SPIMI exchange: tokenize actors append per-partition run files
        # (filesystem-mediated, idempotent under retry; only PENDING
        # partitions are written — the LoadFromBook set-difference);
        # Ray's groupby sort-exchange has a flat latency floor that
        # dominated this stage, so the postings never enter a shuffle.
        spill_dir = os.path.join(index_dir, "spill")
        # stale runs from an interrupted attempt would duplicate
        # postings (batch boundaries differ between runs); the spill is
        # transient — resume granularity is the partition manifest
        shutil.rmtree(spill_dir, ignore_errors=True)
        prepared_docs().map_batches(
            TokenizeSpill,
            fn_constructor_args=(stats_ref, cfg, doc_id_space, spill_dir, pending),
            batch_format="pyarrow",
            batch_size=cfg.spill_batch_size // 2,
            # warm-start half the pool (pure (1,N) autoscale spends most
            # of a short stage ramping up) but keep headroom so the
            # upstream read operator is never starved of CPUs
            concurrency=(max(1, n_cpus // 2), n_cpus),
            num_cpus=1,
        ).count()  # consume: all runs on disk
        spill_wall = time.perf_counter() - ts
        hot_df = {t: stats.df[t] for t in stats.salt_counts(cfg)}
        # doc_id_space MUST match the assigner's (salt cuts replay the
        # assigner's range boundaries; a mismatch makes hot-term blocks
        # span doc ranges held by other partitions, breaking WAND's
        # globally-sorted-disjoint block invariant)
        encoder = make_partition_encoder(
            index_dir, stats.n_docs, stats.avgdl, hot_df, cfg, lineage,
            doc_id_space=doc_id_space,
        )
        summary = ray.data.from_items([{"pid": p} for p in pending]).map_batches(
            make_spill_encoder(spill_dir, encoder),
            batch_format="pyarrow",
            batch_size=1,
            num_cpus=1,
        )
        summary_df = summary.to_pandas()  # small: one row per partition
        shutil.rmtree(spill_dir, ignore_errors=True)
        populate_wall = time.perf_counter() - ts
        encode_wall = populate_wall - spill_wall
    else:
        summary_df = None
        spill_wall = encode_wall = 0.0

    # ---- stage 4: merge (global dictionary) + index-level commit -------
    from mini_ivf_ray.stages.merge import build_dictionary

    ts = time.perf_counter()
    build_dictionary(index_dir, cfg.num_partitions)
    merge_wall = time.perf_counter() - ts

    per_part = []
    totals = {"n_terms": 0, "n_postings": 0, "n_blocks": 0}
    for p in range(cfg.num_partitions):
        try:
            pm = mf.read_partition_manifest(index_dir, p)
        except FileNotFoundError:
            continue  # partition got zero postings (possible at tiny scale)
        per_part.append({"partition": p, **pm["counters"]})
        for k in totals:
            totals[k] += pm["counters"].get(k, 0)
    meta = {
        "lineage": lineage,
        "n_docs": stats.n_docs,
        "total_tokens": stats.total_tokens,
        "avgdl": stats.avgdl,
        "vocab_size": len(stats.df),
        "num_partitions": cfg.num_partitions,
        "partitions": per_part,
        "counters": {
            **totals,
            "prepare_wall_sec": round(prepare_wall, 3),
            "stats_wall_sec": round(stats_wall, 3),
            "populate_wall_sec": round(populate_wall, 3),
            "spill_wall_sec": round(spill_wall, 3),
            "encode_wall_sec": round(encode_wall, 3),
            "merge_wall_sec": round(merge_wall, 3),
            "total_wall_sec": round(time.perf_counter() - t0, 3),
            "partitions_built_this_run": len(pending),
        },
    }
    mf.commit_index(index_dir, meta)
    return meta
