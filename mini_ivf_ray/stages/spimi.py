"""SPIMI posting build: explode -> salted partition spill -> merge-encode.

Reference analog: ``InsertIvf`` (index_ivfpq.cpp:83-120): rows assigned
to coarse lists under per-list locks, then a gather pass packs each
list's codes.  Here the lock-append + gather is a filesystem-mediated
exchange (per-(batch, partition) run files) and the pack is a k-way
streaming merge + delta/varint block encode with block-max metadata.

Skew (north_star "salted skew-splitting of head terms"): a term in the
SALT PLAN is split by doc_id RANGE into ``nsalt`` sub-lists, each routed
to a different partition.  Range (not hash) salting keeps every sub-list
a sorted, disjoint doc_id run, so the term's global posting list is
simply all its blocks ordered by first_doc_id — the merge stage is a
metadata concat, never a re-sort (SURVEY §7.6).

Round-2 single-tokenize design: the corpus is tokenized ONCE (the spill
pass).  The salt plan comes from a deterministic sampled df estimate
(pipelines/build.py); exact global stats (total_tokens, hot-term dfs)
are aggregated FROM the spill pass's per-batch counter rows, so no
separate stats pass re-tokenizes the corpus.  Spill runs are written
already sorted by (term, doc_id); the partition encoder is a k-way
streaming merge with bounded memory (frontier = n_runs x read chunk)
instead of a whole-partition concat + lexsort.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.codec import encode_posting_run
from mini_ivf_ray.functions.hashing import (
    salt_bounds,
    salt_of_doc_ids,
    salted_partition,
    term_partition,
)
from mini_ivf_ray.functions.tokenize import postings_arrays


def tokenize_postings_batch(batch: pa.Table) -> pa.Table:
    """docs -> flat postings (term, doc_id, tf, dl).  The intentional
    semantic widening vs the reference (SURVEY M2): one row per distinct
    term per doc instead of exactly-one list per vector."""
    arrs = postings_arrays(batch["text"].to_pylist(), batch["doc_id"].to_numpy())
    return pa.table(
        {
            "term": pa.array(arrs["term"], type=pa.string()),
            "doc_id": pa.array(arrs["doc_id"], type=pa.uint64()),
            "tf": pa.array(arrs["tf"], type=pa.int64()),
            "dl": pa.array(arrs["dl"], type=pa.int64()),
        }
    )


class PartitionAssigner:
    """Actor-pool stage (SURVEY T1): holds the salt plan {term: nsalt}
    and a lazily-filled term -> partition md5 cache, applied per batch
    with one factorize + per-DISTINCT-term resolution.  Unlike round 1
    it needs NO full-vocabulary stats broadcast — the base partition is
    a pure hash of the term, computed on first sight and cached."""

    def __init__(self, plan: dict[str, int], cfg: PipelineConfig, doc_id_space: int):
        self.cfg = cfg
        self.doc_id_space = doc_id_space  # range-salt denominator
        self.plan = dict(plan)
        self.salt_pids = {
            t: np.array(
                [salted_partition(t, s, cfg.num_partitions) for s in range(n)],
                dtype=np.int64,
            )
            for t, n in self.plan.items()
            if n > 1
        }
        self._pid_cache: dict[str, int] = {}

    def assign(self, terms: np.ndarray, doc_ids: np.ndarray):
        """-> (pid int64 array, codes, uniques): partition per posting.
        ``codes``/``uniques`` are the term factorization (sort=True, so
        codes are ordered by term lexicographically) for reuse by the
        caller's run sort."""
        codes, uniques = pd.factorize(pd.Series(terms, dtype=object), sort=True)
        uniques = np.asarray(uniques, dtype=object)
        upids = np.empty(len(uniques), dtype=np.int64)
        hot_codes: list[tuple[int, np.ndarray]] = []
        cache = self._pid_cache
        n_part = self.cfg.num_partitions
        for i, t in enumerate(uniques):
            pids = self.salt_pids.get(t)
            if pids is not None:
                upids[i] = -1
                hot_codes.append((i, pids))
                continue
            p = cache.get(t)
            if p is None:
                p = term_partition(t, n_part)
                if len(cache) < 4_000_000:
                    cache[t] = p
            upids[i] = p
        pid = upids[codes]
        if hot_codes:
            for code, pids in hot_codes:
                m = codes == code
                s = salt_of_doc_ids(doc_ids[m], len(pids), self.doc_id_space)
                pid[m] = pids[s]
        return pid, codes, uniques

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        pid, _, _ = self.assign(terms, batch["doc_id"].to_numpy())
        return batch.append_column("pid", pa.array(pid))


class TokenizeSpill:
    """Single-tokenize SPIMI spill stage: per docs batch,
    (1) vectorized explode to postings (``postings_arrays``),
    (2) salt-plan partition assignment (one factorize per batch),
    (3) ONE lexsort by (pid, term, doc_id), then ONE run file per batch
        with ONE ROW GROUP per partition slice (each sorted by
        (term, doc_id) for the k-way merge encoder; the encoder selects
        its row groups via the pid column statistics — a
        file-per-(batch, partition) layout cost 64x the file-create
        syscalls and dominated spill wall at small CPU counts),
    (4) returns per-batch COUNTER rows (kind, key, val): exact token
        totals and per-hot-term df partials, later aggregated into the
        corpus stats — this is what lets the build tokenize once.

    The exchange rides the filesystem (shared storage on a cluster) —
    the reference's per-cluster shard write (WriteClusterVector,
    index_ivfpq.cpp:496-514) generalized to parallel writers; Ray's
    groupby sort-exchange has a flat latency floor that dominated this
    stage.  Run-file names are content-derived (min doc_id, row count),
    so a retried task overwrites its own runs instead of duplicating."""

    def __init__(
        self,
        plan: dict[str, int],
        cfg: PipelineConfig,
        doc_id_space: int,
        spill_dir: str,
        pending: list[int],
    ):
        self.assigner = PartitionAssigner(plan, cfg, doc_id_space)
        self.cfg = cfg
        self.spill_dir = spill_dir
        self.pending = set(pending)
        self.hot_terms = set(plan)
        os.makedirs(spill_dir, exist_ok=True)

    @staticmethod
    def _counters_schema() -> pa.Table:
        return pa.table(
            {
                "kind": pa.array([], type=pa.string()),
                "key": pa.array([], type=pa.string()),
                "val": pa.array([], type=pa.int64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        arrs = postings_arrays(
            batch["text"].to_pylist(), batch["doc_id"].to_numpy()
        )
        terms = arrs["term"]
        if terms.size == 0:
            return self._counters_schema()
        doc_ids, tfs, dls = arrs["doc_id"], arrs["tf"], arrs["dl"]
        pid, codes, uniques = self.assigner.assign(terms, doc_ids)

        # ---- counters: exact globals from the one tokenize pass ------
        kinds = ["tt"]
        keys = [""]
        vals = [int(tfs.sum())]  # total tokens in this batch
        if self.hot_terms:
            counts = np.bincount(codes, minlength=len(uniques))
            for i, t in enumerate(uniques):
                if t in self.hot_terms:
                    kinds.append("hot")
                    keys.append(t)
                    vals.append(int(counts[i]))

        # ---- one lexsort -> ONE run file per batch, ONE ROW GROUP per
        # partition slice (sorted by (term, doc) within it).  The
        # encoder selects its partition's row groups by the pid column
        # statistics in the footer — 64x fewer files than the round-1
        # file-per-(batch, partition) layout, whose create/rename
        # syscall volume dominated spill wall at small CPU counts.
        order = np.lexsort((doc_ids, codes, pid))
        pid_s = pid[order]
        tbl = pa.table(
            {
                "pid": pa.array(pid_s, type=pa.int64()),
                "term": pa.array(terms[order], type=pa.string()),
                "doc_id": pa.array(doc_ids[order], type=pa.uint64()),
                "tf": pa.array(tfs[order], type=pa.int64()),
                "dl": pa.array(dls[order], type=pa.int64()),
            }
        )
        tag = f"{int(batch['doc_id'][0].as_py())}_{batch.num_rows}"
        bounds = np.searchsorted(pid_s, np.arange(self.cfg.num_partitions + 1))
        path = os.path.join(self.spill_dir, f"run_{tag}.parquet")
        writer = None
        try:
            for p in range(self.cfg.num_partitions):
                a, z = int(bounds[p]), int(bounds[p + 1])
                if z <= a or p not in self.pending:
                    continue
                if writer is None:
                    writer = pq.ParquetWriter(
                        path + ".tmp", tbl.schema, compression="lz4"
                    )
                writer.write_table(tbl.slice(a, z - a), row_group_size=z - a)
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            os.replace(path + ".tmp", path)
        return pa.table(
            {
                "kind": pa.array(kinds, type=pa.string()),
                "key": pa.array(keys, type=pa.string()),
                "val": pa.array(vals, type=pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# Streaming k-way merge encoder
# ---------------------------------------------------------------------------


def _sort_posting_chunk(tbl: pa.Table):
    """Sort a posting chunk by (term, doc_id) via Arrow dictionary
    encode + C++ string sort.  Returns (sorted_tbl, sorted_codes,
    terms_sorted) where terms_sorted[code] is the term string."""
    ta = tbl["term"].combine_chunks().dictionary_encode()
    dic = ta.dictionary
    sort_idx = pc.sort_indices(dic).to_numpy()
    rank = np.empty(len(dic), dtype=np.int64)
    rank[sort_idx] = np.arange(len(dic))
    codes = rank[ta.indices.to_numpy()]
    order = np.lexsort((tbl["doc_id"].to_numpy(), codes))
    return tbl.take(pa.array(order)), codes[order], dic.take(pa.array(sort_idx))


_MERGE_FANIN = 256
_RUN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.uint64()),
        ("tf", pa.int64()),
        ("dl", pa.int64()),
    ]
)


def _reduce_runs(
    runs: list[tuple[pq.ParquetFile, list[int]]],
    scratch_dir: str,
    fanin: int = _MERGE_FANIN,
) -> list[tuple[pq.ParquetFile, list[int]]]:
    """Multi-level external merge: while the run count exceeds the
    fan-in, merge groups of ``fanin`` runs into intermediate SORTED run
    files (the classic external-merge-sort reduce level).  Keeps the
    frontier memory bound at fanin x read-chunk regardless of how many
    spill batches a 1000x corpus produces."""
    level = 0
    while len(runs) > fanin:
        new_runs: list[tuple[pq.ParquetFile, list[int]]] = []
        for i in range(0, len(runs), fanin):
            sub = runs[i : i + fanin]
            path = os.path.join(scratch_dir, f"merge_l{level}_{i}.parquet")
            w = pq.ParquetWriter(path, _RUN_SCHEMA, compression="lz4")
            # chunks partition the key space in increasing order, so
            # sorted-chunk concatenation yields a globally sorted run
            for chunk in _RunMerger(sub):
                sorted_tbl, _, _ = _sort_posting_chunk(chunk)
                # bounded row groups: a merged chunk can reach
                # fanin x read-chunk rows, and parquet readers
                # decompress whole row groups — cap so the NEXT level's
                # frontier stays read-chunk-sized
                w.write_table(
                    sorted_tbl.select(["term", "doc_id", "tf", "dl"]),
                    row_group_size=131072,
                )
            w.close()
            pf = pq.ParquetFile(path)
            new_runs.append((pf, list(range(pf.metadata.num_row_groups))))
        runs = new_runs
        level += 1
    return runs


_SPILL_WORKERS: dict[str, TokenizeSpill] = {}


def make_spill_fn(plan, cfg, doc_id_space, spill_dir: str, pending: list[int]):
    """Task-pool variant of TokenizeSpill: a plain function whose state
    object is cached per WORKER PROCESS (module global, keyed by
    spill_dir).  Tasks avoid the actor-pool's spin-up/teardown walls —
    at small CPU counts actor startup was a fixed multi-second floor on
    the spill stage — while the per-process cache keeps the md5
    partition cache warm across tasks exactly like an actor would.
    The closure ships only the (small) salt plan per task group."""

    def spill_fn(batch: pa.Table) -> pa.Table:
        w = _SPILL_WORKERS.get(spill_dir)
        if w is None:
            w = TokenizeSpill(plan, cfg, doc_id_space, spill_dir, pending)
            _SPILL_WORKERS.clear()  # one live spill per worker
            _SPILL_WORKERS[spill_dir] = w
        return w(batch)

    return spill_fn


class _RunMerger:
    """K-way streaming merge of spill runs (each sorted by (term,
    doc_id); (term, doc_id) keys are globally unique — every (term, doc)
    posting exists in exactly one run).  Yields chunks that partition
    the key space in increasing order (every key in chunk i precedes
    every key in chunk i+1); rows WITHIN a chunk are a concat of sorted
    slices — the consumer sorts each small chunk (Arrow dictionary-
    encode + C++ string sort, never a whole-partition lexsort).  Memory
    is bounded by n_runs x read-chunk rows, never the partition.

    At run counts above the merge fan-in the encoder first reduces
    runs through ``_reduce_runs`` (multi-level external merge into
    intermediate sorted run files), so frontier memory stays bounded at
    fanin x read-chunk at any corpus size — byte-identical output
    (tested)."""

    def __init__(self, runs: list[tuple[pq.ParquetFile, list[int]]], chunk_rows: int = 32768):
        """``runs``: (open ParquetFile, row-group indices of THIS
        partition's slice) per spill file — row groups are selected by
        the pid column statistics, so only this partition's bytes are
        ever read."""
        self.runs = runs
        self.chunk_rows = chunk_rows

    def __iter__(self):
        totals = [
            sum(r.metadata.row_group(g).num_rows for g in groups)
            for r, groups in self.runs
        ]
        iters = [
            r.iter_batches(
                batch_size=self.chunk_rows,
                row_groups=groups,
                columns=["term", "doc_id", "tf", "dl"],
            )
            for r, groups in self.runs
        ]
        n = len(self.runs)
        buf: list[pa.Table | None] = [None] * n
        done = [False] * n
        read = [0] * n

        def fill(i: int) -> None:
            while buf[i] is None and not done[i]:
                try:
                    b = next(iters[i])
                except StopIteration:
                    done[i] = True
                    return
                read[i] += b.num_rows
                if read[i] >= totals[i]:
                    # metadata-known exhaustion: a fully-buffered run
                    # stops constraining the emit boundary immediately
                    # (without this, k small runs cost k boundary
                    # rounds x k per-run masks = O(k^2) tiny kernels)
                    done[i] = True
                if b.num_rows:
                    buf[i] = pa.Table.from_batches([b])

        for i in range(n):
            fill(i)
        while True:
            # boundary: min last-key among runs that may still produce
            # more rows; buffered rows with key <= boundary are final
            bt = bd = None
            for i in range(n):
                if buf[i] is not None and not done[i]:
                    t = buf[i]["term"][buf[i].num_rows - 1].as_py()
                    d = buf[i]["doc_id"][buf[i].num_rows - 1].as_py()
                    if bt is None or (t, d) < (bt, bd):
                        bt, bd = t, d
            if bt is None:  # every run fully read: flush the remainder
                parts = [b for b in buf if b is not None]
                if parts:
                    yield pa.concat_tables(parts)
                return
            parts = []
            bt_s = pa.scalar(bt, type=pa.string())
            bd_s = pa.scalar(bd, type=pa.uint64())
            for i in range(n):
                b = buf[i]
                if b is None:
                    continue
                lt = pc.less(b["term"], bt_s)
                eq = pc.and_(
                    pc.equal(b["term"], bt_s), pc.less_equal(b["doc_id"], bd_s)
                )
                k = int(pc.sum(pc.cast(pc.or_(lt, eq), pa.int64())).as_py())
                if k > 0:
                    parts.append(b.slice(0, k))
                buf[i] = b.slice(k) if k < b.num_rows else None
                if buf[i] is None:
                    fill(i)
            if parts:
                yield pa.concat_tables(parts)


_SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("first_doc_id", pa.uint64()),
        ("last_doc_id", pa.uint64()),
        ("count", pa.int64()),
        ("max_score", pa.float64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("payload", pa.binary()),
    ]
)

_ROW_GROUP = 4096


class _BlockWriter:
    """Buffers block rows and writes deterministic fixed-size parquet
    row groups (resume byte-identity depends on identical flush
    boundaries across runs)."""

    def __init__(self, path: str):
        self.w = pq.ParquetWriter(path, _SEGMENT_SCHEMA, compression="zstd")
        self.cols: dict[str, list] = {f.name: [] for f in _SEGMENT_SCHEMA}
        self.n = 0

    def append(self, term: str, firsts, lasts, counts, maxs, df: int, cf_blocks, payloads):
        nblk = len(payloads)
        self.cols["term"].extend([term] * nblk)
        self.cols["first_doc_id"].extend(firsts.tolist())
        self.cols["last_doc_id"].extend(lasts.tolist())
        self.cols["count"].extend(counts.tolist())
        self.cols["max_score"].extend(maxs.tolist())
        self.cols["df"].extend([df] * nblk)
        self.cols["cf"].extend(cf_blocks.tolist())
        self.cols["payload"].extend(payloads)
        self.n += nblk
        while self.n >= _ROW_GROUP:
            self._flush_rows(_ROW_GROUP)

    def _flush_rows(self, k: int) -> None:
        tbl = pa.table(
            {
                "term": pa.array(self.cols["term"][:k], type=pa.string()),
                "first_doc_id": pa.array(self.cols["first_doc_id"][:k], type=pa.uint64()),
                "last_doc_id": pa.array(self.cols["last_doc_id"][:k], type=pa.uint64()),
                "count": pa.array(self.cols["count"][:k], type=pa.int64()),
                "max_score": pa.array(self.cols["max_score"][:k], type=pa.float64()),
                "df": pa.array(self.cols["df"][:k], type=pa.int64()),
                "cf": pa.array(self.cols["cf"][:k], type=pa.int64()),
                "payload": pa.array(self.cols["payload"][:k], type=pa.binary()),
            }
        )
        self.w.write_table(tbl, row_group_size=k)
        for c in self.cols.values():
            del c[:k]
        self.n -= k

    def close(self) -> int:
        if self.n:
            self._flush_rows(self.n)
        self.w.close()
        return 0


def decode_block_table(t: pa.Table):
    """Encoded block rows (term, first_doc_id, count, payload) ->
    (terms np.object_, doc_id uint64, tf int64, dl int64) posting
    arrays in block order — i.e. (term, doc_id) sorted within a
    segment.  Inverse of ``encode_posting_run``; fully vectorized: one
    concatenated varint decode, then per-block gather indices from the
    per-block offsets with a carry-corrected global cumsum recovering
    absolute doc_ids.  Works on any row-group slice (every block row is
    self-contained: first_doc_id is absolute)."""
    from mini_ivf_ray.functions.codec import decode_varints

    terms = t["term"].to_pylist()
    firsts = t["first_doc_id"].to_numpy()
    counts = t["count"].to_numpy().astype(np.int64)
    payloads = t["payload"].to_pylist()
    total = int(counts.sum())
    vals = (
        decode_varints(
            np.concatenate([np.frombuffer(p, dtype=np.uint8) for p in payloads])
        )
        if payloads
        else np.empty(0, dtype=np.uint64)
    )
    if total == 0:
        e = np.empty(0)
        return (
            np.empty(0, object),
            e.astype(np.uint64),
            e.astype(np.int64),
            e.astype(np.int64),
        )
    # each block's payload segment is [n-1 doc deltas, n tfs, n dls]
    seg_off = np.concatenate(([0], np.cumsum(3 * counts - 1)[:-1]))
    out_off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(out_off, counts)
    first_rep = np.repeat(firsts.astype(np.uint64), counts)
    gather_delta = np.repeat(seg_off, counts) + pos - 1  # valid where pos > 0
    delta = np.where(pos > 0, vals[np.maximum(gather_delta, 0)], np.uint64(0))
    cs = np.cumsum(delta.astype(np.uint64), dtype=np.uint64)
    carry = np.where(out_off > 0, cs[np.maximum(out_off - 1, 0)], np.uint64(0))
    docs = first_rep + cs - np.repeat(carry, counts)
    gtf = np.repeat(seg_off + counts - 1, counts) + pos
    tfs = vals[gtf].astype(np.int64)
    dls = vals[gtf + np.repeat(counts, counts)].astype(np.int64)
    term_arr = np.repeat(np.asarray(terms, dtype=object), counts)
    return term_arr, docs, tfs, dls


class _SegRowGroup:
    __slots__ = ("num_rows",)

    def __init__(self, n: int):
        self.num_rows = n


class _SegMeta:
    def __init__(self, counts: list[int]):
        self._counts = counts
        self.num_row_groups = len(counts)

    def row_group(self, g: int) -> _SegRowGroup:
        return _SegRowGroup(self._counts[g])


class SegmentRun:
    """A COMMITTED segment file presented as a sorted (term, doc_id,
    tf, dl) merge run — duck-typed to the ``(ParquetFile, row groups)``
    interface ``_RunMerger`` consumes.  The no-resalt append path feeds
    old segments straight into the k-way encoder when the salt plan is
    unchanged: decode is lazy, one parquet row group at a time, so
    frontier memory stays row-group-bounded (4096 blocks) no matter the
    partition size.  ``metadata.row_group(g).num_rows`` reports DECODED
    posting counts (one cheap count-column read at open)."""

    _COLS = ["term", "first_doc_id", "count", "payload"]

    def __init__(self, path: str):
        self.pf = pq.ParquetFile(path)
        counts = []
        for g in range(self.pf.metadata.num_row_groups):
            c = self.pf.read_row_group(g, columns=["count"])["count"]
            counts.append(int(pc.sum(c).as_py() or 0))
        self.metadata = _SegMeta(counts)

    def iter_batches(self, batch_size: int, row_groups=None, columns=None):
        groups = (
            range(self.pf.metadata.num_row_groups)
            if row_groups is None
            else row_groups
        )
        for g in groups:
            t = self.pf.read_row_group(g, columns=self._COLS)
            terms, docs, tfs, dls = decode_block_table(t)
            for s in range(0, docs.size, batch_size):
                e = min(s + batch_size, docs.size)
                yield pa.record_batch(
                    {
                        "term": pa.array(terms[s:e], type=pa.string()),
                        "doc_id": pa.array(docs[s:e], type=pa.uint64()),
                        "tf": pa.array(tfs[s:e], type=pa.int64()),
                        "dl": pa.array(dls[s:e], type=pa.int64()),
                    }
                )


def scan_spill_runs(
    spill_dir: str, with_sizes: bool = False
) -> dict[int, list[tuple[str, list[int]]]] | tuple[dict, dict[int, int]]:
    """ONE footer-metadata pass over the spill run files ->
    {pid: [(file, row-group indices)]}.  Done once on the driver (or one
    task) instead of every encode task re-scanning every footer's
    per-row-group statistics — at 300+ runs that python-level stats walk
    was a visible per-task cost x n_partitions.

    ``with_sizes=True`` additionally returns {pid: total rows} from the
    same footer pass (feeds ``order_pids_lpt`` without re-opening every
    file)."""
    out: dict[int, list[tuple[str, list[int]]]] = {}
    sizes: dict[int, int] = {}
    for f in sorted(glob.glob(os.path.join(spill_dir, "run_*.parquet"))):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index("pid")
        per_pid: dict[int, list[int]] = {}
        for g in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(g)
            st = rg.column(idx).statistics
            if st is None or st.min != st.max:
                raise ValueError(
                    f"{f}: row group {g} is not a single-pid slice"
                )
            p = int(st.min)
            per_pid.setdefault(p, []).append(g)
            sizes[p] = sizes.get(p, 0) + rg.num_rows
        for p, groups in per_pid.items():
            out.setdefault(p, []).append((f, groups))
    return (out, sizes) if with_sizes else out


def order_pids_lpt(
    run_map: dict[int, list], sizes: dict[int, int] | None = None
) -> list[int]:
    """Partition ids ordered by total spill rows DESC (longest-
    processing-time-first): encode tasks are one per partition and
    partition sizes are skewed (salted hot terms), so dispatching the
    big ones first cuts the last-wave straggler tail that capped encode
    scaling efficiency at 0.65 (4-vs-16 CPUs, 1.2M docs).  Pass the
    ``sizes`` from ``scan_spill_runs(with_sizes=True)`` — a separate
    footer pass here would cost driver seconds at high run counts.
    Deterministic (ties by pid asc); commit order never affects output
    bytes — partition commits are independent and atomic."""
    if sizes is None:
        sizes = {}
        for p, runs in run_map.items():
            tot = 0
            for f, groups in runs:
                pf = pq.ParquetFile(f)
                if groups == "segment":
                    tot += pf.metadata.num_rows
                else:
                    tot += sum(
                        pf.metadata.row_group(g).num_rows for g in groups
                    )
            sizes[p] = tot
    return sorted(run_map, key=lambda p: (-sizes.get(p, 0), p))


def make_spill_encoder(
    spill_dir: str,
    run_map: dict[int, list[tuple[str, list[int]]]],
    index_dir: str,
    n_docs: int,
    avgdl: float,
    hot_df: dict[str, int],
    plan: dict[str, int],
    cfg: PipelineConfig,
    lineage: dict,
    doc_id_space: int,
    merge_fanin: int = _MERGE_FANIN,
    segment_filename: str = "postings.parquet",
    incremental: bool = False,
):
    """Returns the map_batches fn encoding + atomically committing one
    partition segment per input pid row, summary rows out.

    Encoding (reference: per-list code gather + pack,
    index_ivfpq.cpp:111-117 / quantizer.cpp:133-160): k-way streaming
    merge of the partition's sorted spill runs; per completed term run,
    vectorized varint/delta pack in ``block_size`` blocks with float64
    per-block max BM25 score (np.maximum.reduceat) and per-block cf
    (np.add.reduceat over int64 tfs — exact).  df for idf: run length
    for normal terms (the whole term lives here), broadcast exact
    global df for salted hot terms.  Hot-term runs are cut at the SALT
    PLAN's doc_id-range boundaries (the assigner's exact integers) so
    no block spans a range held by another partition — the globally-
    sorted-disjoint block invariant WAND merging relies on."""
    from mini_ivf_ray.state import manifest as mf

    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    def encode_term_run(out: _BlockWriter, t: str, d, tf_r, dl_r) -> None:
        if d.size > 1 and not np.all(d[1:] > d[:-1]):
            raise ValueError(
                f"duplicate doc_id in posting run for term {t!r}: "
                "docID hash collision or missing dedup"
            )
        df_global = hot_df.get(t, d.size)
        contrib = bm25.contributions(tf_r, dl_r, df_global, n_docs, avgdl, k1, b)
        nsalt = plan.get(t, 1)
        if nsalt > 1:
            # several doc_id-range salt sub-lists may have collided onto
            # this partition; cut the run at the salt boundaries
            bounds = salt_bounds(nsalt, doc_id_space)
            cuts = np.searchsorted(d, bounds, side="left")
            segs = [
                (int(a), int(z))
                for a, z in zip(
                    np.concatenate([[0], cuts]), np.concatenate([cuts, [d.size]])
                )
                if z > a
            ]
        else:
            segs = [(0, d.size)]
        for a, z in segs:
            firsts, lasts, counts, payloads = encode_posting_run(
                d[a:z], tf_r[a:z], dl_r[a:z], block_size
            )
            local_starts = np.arange(0, z - a, block_size, dtype=np.int64)
            if local_starts.size:
                maxs = np.maximum.reduceat(contrib[a:z], local_starts)
                cfb = np.add.reduceat(tf_r[a:z], local_starts)
            else:
                maxs = np.empty(0)
                cfb = np.empty(0, dtype=np.int64)
            out.append(t, firsts, lasts, counts, maxs, df_global, cfb, payloads)

    def encode_partition(pid: int, runs: list[tuple[pq.ParquetFile, list[int]]]) -> dict:
        counters = {"n_terms": 0, "n_postings": 0, "n_blocks": 0}
        if incremental:
            # resume: this increment's segment already committed here
            done = mf.partition_segment_committed(index_dir, pid, segment_filename)
            if done is not None:
                return dict(done)

        def writer(out_path: str) -> None:
            import shutil
            import tempfile

            nonlocal runs
            scratch = None
            if len(runs) > merge_fanin:
                scratch = tempfile.mkdtemp(prefix=f"graft_merge_p{pid}_")
                runs = _reduce_runs(runs, scratch, fanin=merge_fanin)
            out = _BlockWriter(out_path)

            def consume(codes: np.ndarray, terms_sorted: pa.Array, sorted_tbl, lo: int, hi: int) -> None:
                # codes sorted: iterate completed term runs of rows [lo, hi)
                c = codes[lo:hi]
                d = sorted_tbl["doc_id"].to_numpy()[lo:hi]
                tf_r = sorted_tbl["tf"].to_numpy()[lo:hi]
                dl_r = sorted_tbl["dl"].to_numpy()[lo:hi]
                change = np.empty(c.size, dtype=bool)
                change[0] = True
                change[1:] = c[1:] != c[:-1]
                starts = np.flatnonzero(change)
                ends = np.append(starts[1:], c.size)
                for a, z in zip(starts, ends):
                    t = terms_sorted[int(c[a])].as_py()
                    encode_term_run(out, t, d[a:z], tf_r[a:z], dl_r[a:z])
                    counters["n_terms"] += 1
                    counters["n_postings"] += int(z - a)

            carry: pa.Table | None = None
            chunks = iter(_RunMerger(runs))
            while True:
                chunk = next(chunks, None)
                if chunk is None:
                    tbl = carry
                    carry = None
                    if tbl is None or tbl.num_rows == 0:
                        break
                else:
                    tbl = (
                        pa.concat_tables([carry, chunk])
                        if carry is not None
                        else chunk
                    )
                # sort the (small) chunk by (term, doc_id): Arrow C++
                # dictionary-encode + string sort; python strings only
                # materialize once per term run
                sorted_tbl, codes_s, terms_sorted = _sort_posting_chunk(tbl)
                if chunk is None:
                    split = int(codes_s.size)
                else:
                    # hold back the (possibly incomplete) final term run
                    split = int(
                        np.searchsorted(codes_s, codes_s[-1], side="left")
                    )
                if split > 0:
                    consume(codes_s, terms_sorted, sorted_tbl, 0, split)
                carry = sorted_tbl.slice(split) if split < sorted_tbl.num_rows else None
                if chunk is None:
                    break
            out.close()
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)

        if incremental:

            def file_writer(tmp_path: str) -> None:
                writer(tmp_path)
                counters["n_blocks"] = int(
                    pq.ParquetFile(tmp_path).metadata.num_rows
                )

            mf.commit_partition_segment(
                index_dir, pid, segment_filename, file_writer, counters, lineage
            )
            return counters

        def writer_with_block_count(tmp_dir: str) -> None:
            path = os.path.join(tmp_dir, segment_filename)
            writer(path)
            counters["n_blocks"] = int(pq.ParquetFile(path).metadata.num_rows)

        mf.commit_partition(index_dir, pid, writer_with_block_count, counters, lineage)
        return counters

    def encode_from_spill(batch: pa.Table) -> pa.Table:
        out_rows = {"pid": [], "n_terms": [], "n_postings": [], "n_blocks": []}
        for p in batch["pid"].to_pylist():
            p = int(p)
            file_groups = run_map.get(p, [])
            runs = []
            for f, groups in file_groups:
                if groups == "segment":
                    # committed old segment as a lazily-decoded run
                    # (no-resalt append path)
                    sr = SegmentRun(f)
                    runs.append((sr, list(range(sr.metadata.num_row_groups))))
                else:
                    runs.append((pq.ParquetFile(f), groups))
            if not runs:
                continue
            c = encode_partition(p, runs)
            out_rows["pid"].append(int(p))
            out_rows["n_terms"].append(c["n_terms"])
            out_rows["n_postings"].append(c["n_postings"])
            out_rows["n_blocks"].append(c["n_blocks"])
        return pa.table(
            {
                "pid": pa.array(out_rows["pid"], type=pa.int64()),
                "n_terms": pa.array(out_rows["n_terms"], type=pa.int64()),
                "n_postings": pa.array(out_rows["n_postings"], type=pa.int64()),
                "n_blocks": pa.array(out_rows["n_blocks"], type=pa.int64()),
            }
        )

    return encode_from_spill
