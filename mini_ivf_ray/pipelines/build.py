"""Index build pipeline: pages -> segments, checkpointed + resumable.

Lifecycle mirrors the reference's E1/E2 traces (SURVEY §3), round-2
single-tokenize design:

  1. prepare   extract html -> text, url-dedup, docID assignment
               (reference: LoadFromFileBinary + positional ids)
  2. plan      n_docs/max_doc_id from the prepared parquet METADATA
               (no scan) + a deterministic sampled df estimate that
               yields the hot-term SALT PLAN — the "Train" analog
               (index_ivf.cpp:39-70) shrunk from a full corpus pass to
               a sample; the plan is persisted with the index because
               query-time term locations must replay it exactly.
  3. populate  tokenize ONCE -> salted partition spill (runs written
               sorted by (term, doc_id)) -> per-partition k-way
               streaming merge encode + atomic segment commit
               (reference: Populate/InsertIvf + WriteClusterVector/Id,
               index_ivfpq.cpp:83-120, 496-530).  Exact global stats
               (total_tokens, hot-term dfs) fall out of the spill
               pass's counter rows — no second tokenize.
  4. merge     global dictionary from segment metadata; the full-vocab
               df/cf stats sidecar ("codebook", quantizer.cpp:108-131)
               is DERIVED from the dictionary (exact), not recomputed.
  5. commit    index-level manifest (reference: Finalize,
               index_ivfpq.cpp:532-546)

Resume (north_rule): stats sidecar present -> plan + stats reused
verbatim; per-partition manifest present -> postings for that partition
are FILTERED OUT BEFORE the spill (the LoadFromBook set-difference,
index_ivfpq.cpp:140-154), so a rerun neither recomputes nor re-shuffles
committed partitions.  Mid-build resume without a sidecar recomputes
the plan by re-sampling the same prepared parquet FILES (an evenly
strided slice of the sorted on-disk file list, sized to the
_SAMPLE_TARGET doc budget — see _estimate_salt_plan), reproducing it
exactly as long as the prepared file list is unchanged — committed
segments stay byte-identical.
"""

from __future__ import annotations

import glob
import math
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.stages.prepare import prepare_documents
from mini_ivf_ray.stages.spimi import (
    make_spill_encoder,
    make_spill_fn,
    scan_spill_runs,
)
from mini_ivf_ray.state import manifest as mf
from mini_ivf_ray.state.stats import CorpusStats

_SAMPLE_TARGET = 25_000
"""Docs in the salt-plan sample.  Below this the 'sample' is the whole
corpus (exact plan — all sandbox tests hit this path); above it the
estimate's only failure modes are benign: an under-salted hot term
skews one partition, an over-salted warm term adds a sub-list — both
correct, neither changes scores."""


def _prepared_meta(prep_dir: str) -> tuple[int, int]:
    """(n_docs, max_doc_id) from parquet file metadata / column stats —
    no data scan.  Falls back to a doc_id-column scan per file if the
    writer produced no statistics."""
    n_docs = 0
    max_id = 0
    for f in sorted(glob.glob(os.path.join(prep_dir, "*.parquet"))):
        pf = pq.ParquetFile(f)
        n_docs += pf.metadata.num_rows
        got = False
        try:
            idx = pf.schema_arrow.get_field_index("doc_id")
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no stats")
                max_id = max(max_id, int(st.max))
            got = True
        except Exception:
            pass
        if not got and pf.metadata.num_rows:
            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_numpy()
            if ids.size:
                max_id = max(max_id, int(ids.max()))
    return n_docs, min(max_id, 2**63 - 1)


def _estimate_salt_plan(prep_dir: str, cfg: PipelineConfig, n_docs: int) -> dict[str, int]:
    """Deterministic sampled df estimate -> {term: nsalt (>1)}.

    Samples whole prepared-parquet FILES (evenly spread over the sorted
    file list): the dedup shuffle already distributed urls
    pseudo-randomly across output files, the read stays proportional to
    the sample instead of scanning the corpus, and the choice depends
    only on the on-disk file list — deterministic across runs, block
    orders and cluster sizes, which resume byte-identity relies on.
    Mis-estimation is benign: an under-salted hot term skews one
    partition, an over-salted warm term adds a sub-list; scores never
    change (exact dfs come from the spill pass)."""
    import ray.data

    from collections import Counter

    if n_docs == 0:
        return {}
    files = sorted(glob.glob(os.path.join(prep_dir, "*.parquet")))
    if not files:
        return {}
    frac = min(1.0, _SAMPLE_TARGET / n_docs)
    want = max(1, math.ceil(len(files) * frac))
    step = max(1, len(files) // want)
    sample = files[::step][:want]
    n_sampled = sum(pq.ParquetFile(f).metadata.num_rows for f in sample)
    if n_sampled == 0:
        return {}

    def partials(batch: pa.Table) -> pa.Table:
        # vectorized per-batch df: one factorize + one unique over
        # (doc, term) keys (the per-doc Counter loop made this bounded
        # pass a ~2 s fixed floor on the build — pure Amdahl cost at
        # high CPU counts since the sample size never grows)
        import pandas as pd

        from mini_ivf_ray.functions.tokenize import tokenize_batch

        toks, _ = tokenize_batch(batch["text"].to_pylist())
        counts = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        flat = [t for d in toks for t in d]
        if not flat:
            return pa.table(
                {"term": pa.array([], type=pa.string()),
                 "df": pa.array([], type=pa.int64())}
            )
        inv, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        doc_idx = np.repeat(np.arange(len(toks)), counts)
        pair_keys = np.unique(doc_idx * len(uniq) + inv)
        df = np.bincount(pair_keys % len(uniq), minlength=len(uniq))
        return pa.table(
            {
                "term": pa.array(uniq, type=pa.string()),
                "df": pa.array(df, type=pa.int64()),
            }
        )

    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    # block count sized to the SAMPLE (bounded at _SAMPLE_TARGET docs),
    # not the CPU count: 2*n_cpus blocks over 25k docs meant ~400-doc
    # tasks whose dispatch overhead dominated — a pure Amdahl floor
    # (~2 s at every CPU count) on the otherwise-parallel build
    n_blocks = max(4, min(2 * n_cpus, -(-n_sampled // 1500)))
    ds = ray.data.read_parquet(
        sample, columns=["text"], override_num_blocks=n_blocks
    ).map_batches(partials, batch_format="pyarrow", batch_size=2048)
    # the sample is bounded (_SAMPLE_TARGET docs) regardless of corpus
    # size, so its vocab partials are driver-summable — no groupby
    # exchange (whose flat latency floor dominated the round-1 stats
    # pass at this scale).  ONE vectorized merge (concat + factorize +
    # bincount) instead of a per-batch python Counter.update walk.
    term_parts, df_parts = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        term_parts.append(np.asarray(b["term"].to_pylist(), dtype=object))
        df_parts.append(b["df"].to_numpy())
    df_s: Counter = Counter()
    if term_parts:
        import pandas as pd

        all_terms = np.concatenate(term_parts)
        all_dfs = np.concatenate(df_parts).astype(np.int64)
        inv, uniq = pd.factorize(all_terms, sort=False)
        sums = np.bincount(inv, weights=all_dfs, minlength=len(uniq)).astype(
            np.int64
        )
        df_s = Counter(dict(zip(uniq, sums)))
    scale = n_docs / n_sampled
    th = cfg.hot_df_threshold
    return {
        t: max(2, math.ceil(d * scale / th))
        for t, d in df_s.items()
        if d * scale > th
    }


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
    if os.path.exists(os.path.join(index_dir, "append.json")):
        # an interrupted APPEND owns this index: its partitions mix old
        # and new postings under the increment's plan — a plain build
        # resume here would replay the prior stats sidecar against them
        raise RuntimeError(
            f"{index_dir}: an append is in progress (append.json); "
            "re-run append_index to resume it"
        )
    if os.path.exists(os.path.join(index_dir, "compact.json")):
        # same ownership rule for an interrupted COMPACTION (segments
        # snapshot moved, manifest removed, stats sidecar stale)
        raise RuntimeError(
            f"{index_dir}: a compaction is in progress (compact.json); "
            "re-run compact_index to resume it"
        )
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
    # Staged to Parquet once: the spill pass reads the slim
    # (doc_id, text) table; the staged table doubles as the
    # docID <-> url sidecar (SURVEY §7.3).
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

    # ---- stage 2: plan (metadata + sampled salt plan, or checkpoint) ---
    ts = time.perf_counter()
    prior_stats: CorpusStats | None = None
    if CorpusStats.exists(index_dir):
        # resume with a completed sidecar: replay its plan verbatim —
        # never re-estimate (scores of already-committed partitions
        # were computed under it)
        prior_stats = CorpusStats.load(index_dir)
        n_docs, max_doc_id = prior_stats.n_docs, prior_stats.max_doc_id
        plan = prior_stats.salt_counts(cfg)
    elif corpus_is_empty:
        n_docs = max_doc_id = 0
        plan = {}
    else:
        n_docs, max_doc_id = _prepared_meta(prep_dir)
        plan = _estimate_salt_plan(prep_dir, cfg, n_docs)
    plan_wall = time.perf_counter() - ts

    # ---- stage 3: populate pending partitions --------------------------
    pending = sorted(mf.pending_partitions(index_dir, cfg.num_partitions))
    if corpus_is_empty:
        pending = []
    populate_wall = spill_wall = encode_wall = 0.0
    encode_tasks_wall = spill_rm_wall = 0.0
    total_tokens = prior_stats.total_tokens if prior_stats else 0
    if pending:
        import shutil

        ts = time.perf_counter()
        doc_id_space = 2**64 if cfg.doc_id_from_url else max_doc_id + 1
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
        # TASK pool (not actors): per-worker-process cached state via
        # make_spill_fn — actor-pool spin-up/teardown was a fixed
        # multi-second floor that dominated small-CPU scaling
        counters_ds = prepared_docs().map_batches(
            make_spill_fn(plan, cfg, doc_id_space, spill_dir, pending),
            batch_format="pyarrow",
            batch_size=cfg.spill_batch_size // 2,
            num_cpus=1,
        )
        # exact global aggregates from the ONE tokenize pass.  Counter
        # rows are batches x (1 + n_hot) — small enough to sum on the
        # driver with no shuffle (a Ray groupby here added a flat
        # exchange-latency floor that dominated scaling at small
        # cluster sizes).  At 10^7+-batch scale, insert one
        # repartition+combine level before the driver sum.
        from collections import Counter

        spill_tokens = 0
        hot_counter: Counter = Counter()
        for b in counters_ds.iter_batches(batch_format="pyarrow"):
            kinds = b["kind"].to_pylist()
            keys = b["key"].to_pylist()
            vals = b["val"].to_numpy()
            for kind, key, v in zip(kinds, keys, vals):
                if kind == "tt":
                    spill_tokens += int(v)
                else:
                    hot_counter[key] += int(v)
        spill_hot_df = dict(hot_counter)
        spill_wall = time.perf_counter() - ts

        if prior_stats is not None:
            total_tokens = prior_stats.total_tokens
            hot_df = {t: prior_stats.df[t] for t in plan if t in prior_stats.df}
        else:
            total_tokens = spill_tokens
            hot_df = spill_hot_df
        avgdl = total_tokens / n_docs if n_docs else 0.0
        run_map, run_sizes = scan_spill_runs(spill_dir, with_sizes=True)
        encoder = make_spill_encoder(
            spill_dir, run_map, index_dir, n_docs, avgdl, hot_df, plan, cfg,
            lineage, doc_id_space=doc_id_space,
        )
        # one block per pending partition (encode parallelism must be
        # partition-wide, not bounded by from_items' default block
        # count), dispatched longest-first: partition sizes are skewed,
        # and LPT ordering cuts the last-wave straggler tail that capped
        # encode scaling efficiency at 0.65 (4v16, 1.2M docs)
        from mini_ivf_ray.stages.spimi import order_pids_lpt

        enc_order = order_pids_lpt(run_map, run_sizes) + [
            p for p in pending if p not in run_map
        ]
        summary = ray.data.from_items(
            [{"pid": p} for p in enc_order], override_num_blocks=len(enc_order)
        ).map_batches(
            encoder,
            batch_format="pyarrow",
            batch_size=1,
            num_cpus=1,
        )
        t_enc = time.perf_counter()
        summary.count()  # consume: all partitions committed
        encode_tasks_wall = time.perf_counter() - t_enc
        t_rm = time.perf_counter()
        shutil.rmtree(spill_dir, ignore_errors=True)
        spill_rm_wall = time.perf_counter() - t_rm
        populate_wall = time.perf_counter() - ts
        encode_wall = populate_wall - spill_wall

    # ---- stage 4: merge (global dictionary) + stats sidecar ------------
    from mini_ivf_ray.stages.merge import build_dictionary, load_dictionary

    ts = time.perf_counter()
    build_dictionary(index_dir, cfg.num_partitions)
    if prior_stats is None:
        # full-vocab df/cf derived from the dictionary — exact, and the
        # only place the whole vocabulary is ever assembled
        d = load_dictionary(index_dir)
        terms = d["term"].to_pylist() if d is not None else []
        dfs = d["df"].to_numpy() if d is not None else np.empty(0, np.int64)
        cfs = d["cf"].to_numpy() if d is not None else np.empty(0, np.int64)
        if not pending and not corpus_is_empty:
            # resumed past populate with no sidecar: tokens = sum cf
            total_tokens = int(cfs.sum())
        stats = CorpusStats(
            n_docs=n_docs,
            total_tokens=total_tokens,
            max_doc_id=max_doc_id,
            df={t: int(x) for t, x in zip(terms, dfs)},
            cf={t: int(x) for t, x in zip(terms, cfs)},
            salted=dict(plan),
        )
        stats.save(index_dir)
    else:
        stats = prior_stats
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
            "stats_wall_sec": round(plan_wall, 3),  # the sampled plan pass
            "populate_wall_sec": round(populate_wall, 3),
            "spill_wall_sec": round(spill_wall, 3),
            "encode_wall_sec": round(encode_wall, 3),
            "encode_tasks_wall_sec": round(encode_tasks_wall, 3),
            "spill_rm_wall_sec": round(spill_rm_wall, 3),
            "merge_wall_sec": round(merge_wall, 3),
            "total_wall_sec": round(time.perf_counter() - t0, 3),
            "partitions_built_this_run": len(pending),
        },
    }
    mf.commit_index(index_dir, meta)
    return meta
