"""Index maintenance: document deletion (tombstones) + compaction.

Completes the index lifecycle around build (pipelines/build.py) and
incremental append (pipelines/append.py):

* ``delete_docs``   — record doc ids as tombstones.  Search masks them
                      exactly (live-docs semantics: corpus statistics
                      keep counting deleted documents — the classic
                      Lucene deleted-docs model — so surviving docs
                      score bit-identically to pre-delete search).
* ``compact_index`` — physically rewrite the segments without the
                      tombstoned documents and recompute EXACT corpus
                      statistics, so post-compaction scores equal a
                      fresh build of the remaining corpus.

Reference analog: mini-ivf has no delete (an IVF index is rebuilt from
its codebooks, test_ivfpq_sift1m_baseline.cpp:53-56); this is the
recurring-crawl counterpart the incremental-append user asks for next
(take-downs, robots.txt revocations, licensing removals).  The
compaction rewrite reuses the append machinery end-to-end: committed
segments are decoded (term/doc/tf/dl live in the payload varints),
tombstoned postings are masked out VECTORIZED during the decode
(append._resalt_segments_to_runs drop_ids), and the standard k-way
merge encoder re-packs each partition with the remaining corpus's
exact (n_docs, avgdl, df) — never a re-tokenize of surviving text.

Scale shape: tombstones are a sorted uint64 array broadcast once
(ray.put) — the deletes-between-compactions set is small relative to
the corpus by contract (the same contract Lucene's live-docs bitmap
makes); the compaction itself is embarrassingly parallel per
partition, resumable through the same committed-partition book as
build/append, and the only driver-side work is O(tombstones).

Crash safety mirrors append: a ``compact.json`` marker is written
BEFORE any index mutation; an interrupted compaction resumes from the
marker (committed partitions skip, the tombstone snapshot frozen in
the marker keeps the rewrite deterministic even if new deletes arrive
mid-compaction); ``build_index``/``append_index`` refuse to touch an
index mid-compaction via the marker check in ``assert_no_maintenance``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.append import (
    _existing_id_hits,
    _prev_dir,
    _resalt_segments_to_runs,
    append_marker_path,
)
from mini_ivf_ray.pipelines.build import _prepared_meta
from mini_ivf_ray.state import manifest as mf
from mini_ivf_ray.state.stats import CorpusStats


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes.parquet")


def compact_marker_path(index_dir: str) -> str:
    return os.path.join(index_dir, "compact.json")


def deleted_ids(index_dir: str) -> np.ndarray:
    """Sorted uint64 tombstoned doc ids (empty array when none)."""
    path = tombstones_path(index_dir)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.uint64)
    return pq.read_table(path)["doc_id"].to_numpy().astype(np.uint64)


def _write_tombstones(index_dir: str, ids: np.ndarray) -> None:
    path = tombstones_path(index_dir)
    if ids.size == 0:
        if os.path.exists(path):
            os.remove(path)
        return
    t = pa.table({"doc_id": pa.array(np.unique(ids), type=pa.uint64())})
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)


def assert_no_maintenance(index_dir: str, op: str) -> None:
    if os.path.exists(compact_marker_path(index_dir)):
        raise RuntimeError(
            f"{op}: index at {index_dir} has an in-progress compaction "
            "(compact.json) — finish it with compact_index() first"
        )


def delete_docs(
    index_dir: str, doc_ids, on_missing: str = "error"
) -> dict:
    """Tombstone ``doc_ids`` in a committed index.

    Effective immediately for search (pipelines/query.search masks
    tombstones before the top-k cut); the postings are physically
    removed — and statistics updated — by ``compact_index``.  Ids are
    verified against the index's prepared corpus (broadcast-id probe,
    O(increment) driver work): ``on_missing="error"`` raises on unknown
    ids, ``"ignore"`` drops them.  Idempotent UNTIL the next compaction:
    re-deleting a tombstoned id is a no-op, but once ``compact_index``
    physically drops the doc from prepared/ the id is unknown to the
    index, so replaying the same delete with the default
    ``on_missing="error"`` raises — callers replaying delete logs
    across a compaction boundary should pass ``on_missing="ignore"``.
    A deleted url stays deleted on re-crawl append
    (``on_existing="skip"`` keeps the committed — tombstoned — version)
    until a compaction physically removes it."""
    assert_no_maintenance(index_dir, "delete_docs")
    if os.path.exists(append_marker_path(index_dir)):
        raise RuntimeError(
            f"delete_docs: index at {index_dir} has an in-progress append"
        )
    if mf.read_index_manifest(index_dir) is None:
        raise FileNotFoundError(
            f"delete_docs: no committed index at {index_dir}"
        )
    if on_missing not in ("error", "ignore"):
        raise ValueError(
            f"on_missing must be 'error' or 'ignore', got {on_missing!r}"
        )
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.uint64))
    prep_dir = os.path.join(index_dir, "prepared")
    files = [f for f in os.listdir(prep_dir) if f.endswith(".parquet")]
    hits = _existing_id_hits(prep_dir, files, ids)
    missing = np.setdiff1d(ids, hits)
    if missing.size and on_missing == "error":
        raise KeyError(
            f"delete_docs: {missing.size} doc id(s) not in the index "
            f"(first: {missing[:5].tolist()}); use on_missing='ignore' "
            "to skip them"
        )
    prior = deleted_ids(index_dir)
    merged = np.union1d(prior, hits)
    _write_tombstones(index_dir, merged)
    return {
        "requested": int(ids.size),
        "missing": int(missing.size),
        "new_tombstones": int(merged.size - prior.size),
        "total_tombstones": int(merged.size),
    }


def _removed_deltas(
    prep_dir: str, tomb: np.ndarray, plan_terms: list[str]
) -> dict:
    """Exact statistics the tombstoned documents take with them:
    total token count and, for each SALTED plan term (the only terms
    whose df must be known before encode — every other term's df is
    its merged run length), the removed document frequency.  One
    broadcast-filtered read of the prepared corpus + tokenize of ONLY
    the deleted documents — O(tombstones) work, identical tokenizer to
    the spill stage so the removed dl matches the indexed dl exactly."""
    import ray
    import ray.data

    from mini_ivf_ray.functions.tokenize import term_freqs

    if tomb.size == 0:
        return {"removed_docs": 0, "removed_tokens": 0, "removed_df": {}}
    tomb_ref = ray.put(tomb)
    plan_set = frozenset(plan_terms)

    def scan(batch: pa.Table) -> pa.Table:
        import ray as _ray

        t = _ray.get(tomb_ref)
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        pos = np.minimum(np.searchsorted(t, ids), t.size - 1)
        keep = t[pos] == ids
        if not keep.any():
            return pa.table(
                {"kind": pa.array([], type=pa.string()),
                 "key": pa.array([], type=pa.string()),
                 "val": pa.array([], type=pa.int64())}
            )
        texts = batch["text"].filter(pa.array(keep)).to_pylist()
        kinds, keys, vals = ["docs", "tokens"], ["", ""], [int(keep.sum()), 0]
        tok = 0
        df: dict[str, int] = {}
        for tx in texts:
            c = term_freqs(tx)
            tok += sum(c.values())
            for pt in plan_set:
                if pt in c:
                    df[pt] = df.get(pt, 0) + 1
        vals[1] = tok
        for k, v in df.items():
            kinds.append("df")
            keys.append(k)
            vals.append(v)
        return pa.table(
            {"kind": pa.array(kinds, type=pa.string()),
             "key": pa.array(keys, type=pa.string()),
             "val": pa.array(vals, type=pa.int64())}
        )

    rows = (
        ray.data.read_parquet(
            glob.glob(os.path.join(prep_dir, "*.parquet")),
            columns=["doc_id", "text"],
        )
        .map_batches(scan, batch_format="pyarrow")
        .to_pandas()
    )
    out = {"removed_docs": 0, "removed_tokens": 0, "removed_df": {}}
    for kind, key, val in rows.itertuples(index=False):
        if kind == "docs":
            out["removed_docs"] += int(val)
        elif kind == "tokens":
            out["removed_tokens"] += int(val)
        else:
            out["removed_df"][key] = out["removed_df"].get(key, 0) + int(val)
    return out


def _drop_from_prepared(prep_dir: str, tomb: np.ndarray) -> int:
    """Rewrite prepared files without the tombstoned ids (so future
    appends / rebuilds cannot resurrect them).  Only files containing
    hits are rewritten; idempotent."""
    dropped = 0
    if tomb.size == 0:  # pure segment-merge compaction: nothing to drop
        return 0
    for f in sorted(glob.glob(os.path.join(prep_dir, "*.parquet"))):
        t = pq.read_table(f)
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        pos = np.minimum(np.searchsorted(tomb, ids), tomb.size - 1)
        keep = tomb[pos] != ids
        if keep.all():
            continue
        dropped += int((~keep).sum())
        pq.write_table(t.filter(pa.array(keep)), f + ".tmp")
        os.replace(f + ".tmp", f)
    return dropped


def compact_index(index_dir: str, cfg: PipelineConfig | None = None) -> dict:
    """Physically remove tombstoned documents and recompute exact
    statistics.  After compaction, search over this index is
    score-identical to a fresh build of the remaining corpus under the
    same salt plan (byte-identical segments whenever the plans coincide
    — always when no term is salted; tests/test_maintenance.py asserts
    it).  The committed salt plan is reused — like append's
    ``reuse_plan`` steady state, deletions don't change a web corpus's
    hot-term profile, and the plan shapes only partition balance and
    block boundaries, never scores.

    No-op (returns the current manifest) when there are no tombstones.
    Resumable from ``compact.json``."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    marker = compact_marker_path(index_dir)
    prep_dir = os.path.join(index_dir, "prepared")
    prev_root = _prev_dir(index_dir)
    spill_root = os.path.join(index_dir, "compact_spill")
    snap_path = os.path.join(index_dir, "compact_deletes.parquet")
    t0 = time.perf_counter()

    if os.path.exists(marker):
        with open(marker) as f:
            state = json.load(f)
    else:
        existing = mf.read_index_manifest(index_dir)
        if existing is None:
            raise FileNotFoundError(
                f"compact_index: no committed index at {index_dir}"
            )
        if os.path.exists(append_marker_path(index_dir)):
            raise RuntimeError(
                f"compact_index: index at {index_dir} has an in-progress "
                "append — finish it with append_index() first"
            )
        tomb = deleted_ids(index_dir)
        bounds_exact = existing.get("lineage", {}).get("bounds_exact", True)
        if tomb.size == 0 and bounds_exact:
            # nothing to remove and the index is single-epoch with exact
            # stored bounds — nothing to do.  (A multi-epoch index —
            # incremental appends — proceeds even with no tombstones:
            # compaction is also the segment merger / bound tightener.)
            return existing
        prior_stats = CorpusStats.load(index_dir)
        if tomb.size:
            deltas = _removed_deltas(
                prep_dir, tomb, list(prior_stats.salted or {})
            )
        else:
            deltas = {"removed_docs": 0, "removed_tokens": 0, "removed_df": {}}
        # snapshot the tombstone set: deletes arriving DURING a long
        # compaction stay tombstones for the next cycle.  (A pure
        # segment-merge compaction has no tombstones file — snapshot an
        # empty set directly.)
        if os.path.exists(tombstones_path(index_dir)):
            shutil.copyfile(tombstones_path(index_dir), snap_path)
        else:
            t = pa.table({"doc_id": pa.array([], type=pa.uint64())})
            pq.write_table(t, snap_path + ".tmp")
            os.replace(snap_path + ".tmp", snap_path)
        state = {
            "compaction": len(
                existing.get("lineage", {}).get("compactions", [])
            ) + 1,
            "prior": {
                "n_docs": prior_stats.n_docs,
                "total_tokens": prior_stats.total_tokens,
                "lineage": existing.get("lineage", {}),
            },
            **deltas,
        }
        with open(marker + ".tmp", "w") as f:
            json.dump(state, f)
        os.replace(marker + ".tmp", marker)

    tomb = pq.read_table(snap_path)["doc_id"].to_numpy().astype(np.uint64)
    prior = state["prior"]

    # idempotent mutations (resume completes them)
    seg_root = os.path.join(index_dir, "segments")
    if not os.path.exists(prev_root) and os.path.exists(seg_root):
        os.replace(seg_root, prev_root)
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        os.remove(man_path)
    _drop_from_prepared(prep_dir, tomb)

    _prior_stats = CorpusStats.load(index_dir)  # sidecar still pre-compact
    plan = dict(_prior_stats.salted or {})
    n_docs, max_doc_id = _prepared_meta(prep_dir)
    doc_id_space = 2**64 if cfg.doc_id_from_url else max_doc_id + 1
    pending = sorted(mf.pending_partitions(index_dir, cfg.num_partitions))

    if pending:
        import ray
        import ray.data

        from mini_ivf_ray.stages.spimi import make_spill_encoder, scan_spill_runs

        old_dir = os.path.join(spill_root, "old")
        shutil.rmtree(old_dir, ignore_errors=True)
        _resalt_segments_to_runs(
            prev_root, old_dir, plan, cfg, doc_id_space, set(pending),
            drop_ids=tomb,
        )
        total_tokens = prior["total_tokens"] - int(state["removed_tokens"])
        avgdl = total_tokens / n_docs if n_docs else 0.0
        hot_df = {
            t: _prior_stats.df.get(t, 0) - int(state["removed_df"].get(t, 0))
            for t in plan
        }
        run_map: dict[int, list] = {}
        run_sizes: dict[int, int]
        rm_scan, run_sizes = scan_spill_runs(old_dir, with_sizes=True)
        for p, rs in rm_scan.items():
            run_map.setdefault(p, []).extend(rs)
        lineage = {
            "builder": "mini_ivf_ray.compact_index",
            "compaction": state["compaction"],
        }
        encoder = make_spill_encoder(
            spill_root, run_map, index_dir, n_docs, avgdl, hot_df, plan, cfg,
            lineage, doc_id_space=doc_id_space,
        )
        from mini_ivf_ray.stages.spimi import order_pids_lpt

        enc_order = order_pids_lpt(run_map, run_sizes) + [
            p for p in pending if p not in run_map
        ]
        ray.data.from_items(
            [{"pid": p} for p in enc_order], override_num_blocks=len(enc_order)
        ).map_batches(
            encoder, batch_format="pyarrow", batch_size=1, num_cpus=1
        ).count()
        shutil.rmtree(spill_root, ignore_errors=True)

    # finalize: dictionary + stats sidecar + manifest (exact, from segments)
    from mini_ivf_ray.stages.merge import build_dictionary, load_dictionary

    build_dictionary(index_dir, cfg.num_partitions)
    d = load_dictionary(index_dir)
    terms = d["term"].to_pylist() if d is not None else []
    dfs = d["df"].to_numpy() if d is not None else np.empty(0, np.int64)
    cfs = d["cf"].to_numpy() if d is not None else np.empty(0, np.int64)
    stats = CorpusStats(
        n_docs=n_docs,
        total_tokens=int(cfs.sum()),
        max_doc_id=max_doc_id,
        df={t: int(x) for t, x in zip(terms, dfs)},
        cf={t: int(x) for t, x in zip(terms, cfs)},
        salted=plan,
    )
    stats.save(index_dir)

    per_part = []
    totals = {"n_terms": 0, "n_postings": 0, "n_blocks": 0}
    for p in range(cfg.num_partitions):
        try:
            pm = mf.read_partition_manifest(index_dir, p)
        except FileNotFoundError:
            continue
        per_part.append({"partition": p, **pm["counters"]})
        for k in totals:
            totals[k] += pm["counters"].get(k, 0)
    compactions = list(prior.get("lineage", {}).get("compactions", []))
    compactions.append(
        {
            "compaction": state["compaction"],
            "prior_n_docs": prior["n_docs"],
            "removed_docs": int(state["removed_docs"]),
        }
    )
    meta = {
        "lineage": {
            "builder": "mini_ivf_ray.compact_index",
            "config": {
                "num_partitions": cfg.num_partitions,
                "block_size": cfg.block_size,
                "k1": cfg.k1,
                "b": cfg.b,
                "hot_df_threshold": cfg.hot_df_threshold,
            },
            "increments": list(
                prior.get("lineage", {}).get("increments", [])
            ),
            "compactions": compactions,
            # compaction re-encoded every partition into one segment
            # under the current exact statistics: stored per-block
            # max_scores are trustworthy upper bounds again
            "bounds_exact": True,
        },
        "n_docs": stats.n_docs,
        "total_tokens": stats.total_tokens,
        "avgdl": stats.avgdl,
        "vocab_size": len(stats.df),
        "num_partitions": cfg.num_partitions,
        "partitions": per_part,
        "counters": {
            **totals,
            "compact_wall_sec": round(time.perf_counter() - t0, 3),
            "partitions_built_this_run": len(pending),
            "removed_docs": int(state["removed_docs"]),
        },
    }
    mf.commit_index(index_dir, meta)

    # retire compacted tombstones; deletes that arrived mid-compaction
    # stay live for the next cycle
    remaining = np.setdiff1d(deleted_ids(index_dir), tomb)
    _write_tombstones(index_dir, remaining)
    os.remove(snap_path)
    shutil.rmtree(prev_root, ignore_errors=True)
    os.remove(marker)
    return meta


def index_epochs(index_dir: str, cfg: PipelineConfig | None = None) -> int:
    """Maximum number of segment files in any partition: 1 for a fresh
    or compacted index, 1 + k after k incremental appends touched that
    partition.  This is the multi-epoch query-cost driver — every epoch
    adds per-term decode-and-merge work (sources/decoded.py re-blocks
    across epochs) and per-partition file opens on the cold path."""
    from mini_ivf_ray.sources.segments import partition_segment_files

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    return max(
        (
            len(partition_segment_files(index_dir, p))
            for p in range(cfg.num_partitions)
        ),
        default=0,
    )


def maybe_compact(
    index_dir: str,
    cfg: PipelineConfig | None = None,
    max_epochs: int = 4,
) -> dict:
    """Auto-compaction policy: compact when the index has accumulated
    more than ``max_epochs`` segment epochs (or has tombstones past the
    same review point).  The threshold bounds the multi-epoch query-cost
    overhead — measured in bench.py (``query_topk_5epoch`` vs
    ``query_topk_compacted_after_5``), the decode-time bound
    recomputation keeps the per-query cost within a small factor of the
    compacted index, so a small ``max_epochs`` is about file-count and
    spin-up hygiene, not correctness.

    Returns ``{"compacted": bool, "epochs_before": int, "epochs_after":
    int, "manifest": dict | None}`` — the manifest only when a
    compaction ran."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    before = index_epochs(index_dir, cfg)
    if before <= max_epochs:
        return {
            "compacted": False,
            "epochs_before": before,
            "epochs_after": before,
            "manifest": None,
        }
    meta = compact_index(index_dir, cfg)
    return {
        "compacted": True,
        "epochs_before": before,
        "epochs_after": index_epochs(index_dir, cfg),
        "manifest": meta,
    }


def delete_by_query(
    index_dir: str,
    query_text: str,
    cfg=None,
    mode: str = "or",
) -> dict:
    """ES ``_delete_by_query``: tombstone every document matching the
    term query (``mode="or"`` disjunctive — any term; ``"and"``
    conjunctive — all terms), returning ``{"deleted": n}``.

    The match set comes from the index's own postings (the
    disjunctive/conjunctive kernels search uses), so the operation is
    index-local and postings-proportional; the resulting id set is
    match-proportional — the same size class as a tombstone array,
    which is exactly what it becomes (``delete_docs``; statistics
    keep counting the victims until ``compact_index``, the Lucene
    live-docs model ES's delete-by-query also follows).  Idempotent:
    re-running the same query re-deletes an already-tombstoned set
    (delete_docs no-ops on tombstoned ids)."""
    import numpy as np

    from mini_ivf_ray.config import PipelineConfig
    from mini_ivf_ray.pipelines.facets import FacetCounter
    from mini_ivf_ray.pipelines.query import BM25Searcher

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    s = BM25Searcher(index_dir, cfg)
    if mode == "or":
        docs = FacetCounter.disjunctive_matches_for_text(s, query_text)
    else:
        docs, _scores = s.conjunctive_matches_for_text(query_text)
    docs = np.asarray(docs, dtype=np.uint64)
    if docs.size:
        delete_docs(index_dir, docs.tolist(), on_missing="error")
    return {"deleted": int(docs.size)}
