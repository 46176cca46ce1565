"""SPIMI posting build: explode -> salted partition shuffle -> encode.

Reference analog: ``InsertIvf`` (index_ivfpq.cpp:83-120): rows assigned
to coarse lists under per-list locks, then a gather pass packs each
list's codes.  Here the lock-append + gather is ONE Ray ``groupby``
shuffle keyed by the salted term partition, and the pack is
``map_groups`` encoding delta+varint blocks with block-max metadata.

Skew (north_star "salted skew-splitting of head terms"): a term with
df > hot_df_threshold is split by doc_id RANGE into ``nsalt`` sub-lists,
each routed to a different partition.  Range (not hash) salting keeps
every sub-list a sorted, disjoint doc_id run, so the term's global
posting list is simply all its blocks ordered by first_doc_id — the
merge stage is a metadata concat, never a re-sort (SURVEY §7.6).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
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
from mini_ivf_ray.state.stats import CorpusStats


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


class TokenizeAssign:
    """Fused tokenize + partition-assign actor stage: docs batches in,
    partitioned postings out.  One stage (a) avoids Ray's operator
    fusion applying the downstream batch_size to the upstream docs
    input (which collapsed parallelism to 2 tasks), (b) never ships the
    unpartitioned postings through the object store, and (c) assigns
    partitions while the terms are still Python strings from the
    tokenizer — an intermediate Arrow table would pay an 18ms/batch
    string round trip just to look them up again."""

    def __init__(self, stats_ref, cfg: PipelineConfig, doc_id_space: int):
        a = PartitionAssigner(stats_ref, cfg, doc_id_space)
        self.pid_map = a.pid_map
        self.salt_pids = a.salt_pids
        self.cfg = cfg
        self.doc_id_space = doc_id_space
        # per hot term: exact uint64 salt boundaries (Python ints for
        # scalar bisect; identical values to the encoder's cuts)
        self.salt_bounds = {
            t: [int(b) for b in salt_bounds(len(p), doc_id_space)]
            for t, p in self.salt_pids.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bisect import bisect_right

        from mini_ivf_ray.functions.tokenize import term_freqs

        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy()
        terms_out: list[str] = []
        docs_out: list[int] = []
        tfs_out: list[int] = []
        dls_out: list[int] = []
        pids_out: list[int] = []
        pid_get = self.pid_map.get
        n_part = self.cfg.num_partitions
        for text, did in zip(texts, doc_ids.tolist()):
            c = term_freqs(text)
            if not c:
                continue
            dl = sum(c.values())
            for t, f in c.items():
                p = pid_get(t)
                if p is None:
                    pids = self.salt_pids.get(t)
                    if pids is None:
                        p = term_partition(t, n_part)
                    else:
                        p = int(pids[bisect_right(self.salt_bounds[t], did)])
                terms_out.append(t)
                docs_out.append(did)
                tfs_out.append(f)
                dls_out.append(dl)
                pids_out.append(p)
        return pa.table(
            {
                "term": pa.array(terms_out, type=pa.string()),
                "doc_id": pa.array(docs_out, type=pa.uint64()),
                "tf": pa.array(tfs_out, type=pa.int64()),
                "dl": pa.array(dls_out, type=pa.int64()),
                "pid": pa.array(pids_out, type=pa.int64()),
            }
        )


class PartitionAssigner:
    """Actor-pool stage (SURVEY T1): holds the term -> partition map and
    the hot-term salt plan, built once per actor from the broadcast
    corpus stats (``ray.put`` ref), then applied per batch with pandas
    C-speed dict mapping."""

    def __init__(self, stats_ref, cfg: PipelineConfig, doc_id_space: int):
        import ray

        stats: CorpusStats = ray.get(stats_ref) if not isinstance(stats_ref, CorpusStats) else stats_ref
        self.cfg = cfg
        self.doc_id_space = doc_id_space  # max_doc_id + 1 (range-salt denominator)
        self.salts = stats.salt_counts(cfg)
        self.pid_map = {
            t: term_partition(t, cfg.num_partitions)
            for t in stats.df
            if t not in self.salts
        }
        self.salt_pids = {
            t: np.array(
                [salted_partition(t, s, cfg.num_partitions) for s in range(n)],
                dtype=np.int64,
            )
            for t, n in self.salts.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        # factorize once (C speed), then resolve partitions per DISTINCT
        # term — per-row dict maps and per-hot-term string scans were the
        # assign hot spot at scale
        codes, uniques = pd.factorize(
            np.asarray(batch["term"].to_pylist(), dtype=object)
        )
        upids = np.empty(len(uniques), dtype=np.int64)
        hot_codes: list[tuple[int, np.ndarray]] = []
        for i, t in enumerate(uniques):
            p = self.pid_map.get(t)
            if p is None:
                pids = self.salt_pids.get(t)
                if pids is None:  # unseen in stats (shouldn't happen same-corpus)
                    upids[i] = term_partition(t, self.cfg.num_partitions)
                else:
                    upids[i] = -1
                    hot_codes.append((i, pids))
            else:
                upids[i] = p
        pid = upids[codes]
        if hot_codes:
            doc_ids = batch["doc_id"].to_numpy()
            for code, pids in hot_codes:
                m = codes == code
                s = salt_of_doc_ids(doc_ids[m], len(pids), self.doc_id_space)
                pid[m] = pids[s]
        return batch.append_column("pid", pa.array(pid))


class TokenizeSpill(TokenizeAssign):
    """SPIMI spill variant: instead of handing postings to a Ray
    groupby (whose M x R object-store exchange has a flat ~tens-of-
    seconds latency floor), each batch's postings are split by pid
    (one vectorized argsort) and APPENDED as per-partition run files
    under ``spill_dir/pid=<p>/``.  The exchange rides the filesystem
    (shared storage on a cluster) — the reference's per-cluster shard
    write (WriteClusterVector, index_ivfpq.cpp:496-514) generalized to
    parallel writers.

    Run-file names are content-derived (min doc_id, row count), so a
    retried task overwrites its own runs instead of duplicating them."""

    def __init__(self, stats_ref, cfg, doc_id_space, spill_dir: str, pending: list[int]):
        super().__init__(stats_ref, cfg, doc_id_space)
        self.spill_dir = spill_dir
        self.pending = set(pending)
        for p in pending:
            os.makedirs(os.path.join(spill_dir, f"pid={p}"), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tbl = super().__call__(batch)
        if tbl.num_rows == 0:
            return pa.table({"pid": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        pids = tbl["pid"].to_numpy()
        order = np.argsort(pids, kind="stable")
        tbl = tbl.take(order)
        sorted_pids = pids[order]
        tag = f"{int(batch['doc_id'][0].as_py())}_{batch.num_rows}"
        out_p, out_n = [], []
        bounds = np.searchsorted(
            sorted_pids, np.arange(self.cfg.num_partitions + 1)
        )
        for p in range(self.cfg.num_partitions):
            a, z = int(bounds[p]), int(bounds[p + 1])
            if z <= a or p not in self.pending:
                continue
            run = tbl.slice(a, z - a).drop_columns(["pid"])
            path = os.path.join(self.spill_dir, f"pid={p}", f"run_{tag}.parquet")
            pq.write_table(run, path + ".tmp", compression="lz4")
            os.replace(path + ".tmp", path)
            out_p.append(p)
            out_n.append(z - a)
        return pa.table(
            {"pid": pa.array(out_p, type=pa.int64()),
             "n": pa.array(out_n, type=pa.int64())}
        )


def make_partition_encoder(
    index_dir: str,
    n_docs: int,
    avgdl: float,
    hot_df: dict[str, int],
    cfg: PipelineConfig,
    lineage: dict,
    doc_id_space: int = 2**64,
):
    """Returns the ``map_groups`` function that encodes + atomically
    commits one partition segment and yields a summary row.

    Encoding (reference: per-list code gather + pack,
    index_ivfpq.cpp:111-117 / quantizer.cpp:133-160): sort group by
    (term, doc_id), slice per-term runs, vectorized varint/delta pack in
    ``block_size`` blocks, float64 per-block max BM25 score
    (np.maximum.reduceat).  df for idf: group-local run length for
    normal terms (the whole term lives here), broadcast global df for
    salted hot terms.
    """
    import pyarrow.parquet as pq_mod

    from mini_ivf_ray.state import manifest as mf

    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    def encode_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_summary()
        pid = int(group["pid"][0].as_py())
        # factorize terms to int codes: lexsort on ints is ~10x faster
        # than sorting Python string objects, and the sort dominates the
        # encode CPU.  Sort codes by term string first so output order
        # stays lexicographic (the segment files' term-sorted invariant).
        codes_raw, uniques = pd.factorize(
            pd.Series(group["term"].to_pylist(), dtype=object), sort=True
        )
        terms_lookup = np.asarray(uniques, dtype=object)
        doc_ids = group["doc_id"].to_numpy().astype(np.uint64)
        tfs = group["tf"].to_numpy()
        dls = group["dl"].to_numpy()
        order = np.lexsort((doc_ids, codes_raw))
        codes = codes_raw[order]
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]

        # term run boundaries
        change = np.empty(codes.size, dtype=bool)
        change[0] = True
        change[1:] = codes[1:] != codes[:-1]
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], codes.size)

        out_term: list[str] = []
        out_first: list[np.ndarray] = []
        out_last: list[np.ndarray] = []
        out_count: list[np.ndarray] = []
        out_max: list[np.ndarray] = []
        out_payload: list[bytes] = []
        out_df: list[np.ndarray] = []
        n_postings = 0

        for rs, re_ in zip(run_starts, run_ends):
            t = terms_lookup[codes[rs]]
            d, tf_r, dl_r = doc_ids[rs:re_], tfs[rs:re_], dls[rs:re_]
            if d.size > 1 and not np.all(d[1:] > d[:-1]):
                raise ValueError(
                    f"duplicate doc_id in posting run for term {t!r}: "
                    "docID hash collision or missing dedup"
                )
            df_global = hot_df.get(t, d.size)
            contrib = bm25.contributions(tf_r, dl_r, df_global, n_docs, avgdl, k1, b)
            # hot terms: several doc_id-range salt sub-lists may have
            # collided onto this partition; cut the run at the salt
            # boundaries so no block spans a range held elsewhere —
            # global block disjointness is what WAND merging relies on
            if t in hot_df:
                nsalt = cfg.salts_for_df(df_global)
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
                maxs = (
                    np.maximum.reduceat(contrib[a:z], local_starts)
                    if local_starts.size
                    else np.empty(0)
                )
                nblk = len(payloads)
                out_term.extend([t] * nblk)
                out_first.append(firsts)
                out_last.append(lasts)
                out_count.append(counts)
                out_max.append(maxs)
                out_payload.extend(payloads)
                out_df.append(np.full(nblk, df_global, dtype=np.int64))
            n_postings += d.size

        blocks = pa.table(
            {
                "term": pa.array(out_term, type=pa.string()),
                "first_doc_id": pa.array(np.concatenate(out_first), type=pa.uint64()),
                "last_doc_id": pa.array(np.concatenate(out_last), type=pa.uint64()),
                "count": pa.array(np.concatenate(out_count), type=pa.int64()),
                "max_score": pa.array(np.concatenate(out_max), type=pa.float64()),
                "df": pa.array(np.concatenate(out_df), type=pa.int64()),
                "payload": pa.array(out_payload, type=pa.binary()),
            }
        )

        def writer(tmp_dir: str) -> None:
            pq_mod.write_table(
                blocks,
                f"{tmp_dir}/postings.parquet",
                row_group_size=4096,
                compression="zstd",
            )

        counters = {
            "n_terms": int(run_starts.size),
            "n_postings": int(n_postings),
            "n_blocks": int(blocks.num_rows),
        }
        mf.commit_partition(index_dir, pid, writer, counters, lineage)
        return pa.table(
            {
                "pid": pa.array([pid], type=pa.int64()),
                "n_terms": pa.array([counters["n_terms"]], type=pa.int64()),
                "n_postings": pa.array([counters["n_postings"]], type=pa.int64()),
                "n_blocks": pa.array([counters["n_blocks"]], type=pa.int64()),
            }
        )

    def _empty_summary() -> pa.Table:
        return pa.table(
            {
                "pid": pa.array([], type=pa.int64()),
                "n_terms": pa.array([], type=pa.int64()),
                "n_postings": pa.array([], type=pa.int64()),
                "n_blocks": pa.array([], type=pa.int64()),
            }
        )

    return encode_partition


def make_spill_encoder(spill_dir: str, encoder):
    """Wrap a partition encoder to source its group from spilled run
    files: one task per pid reads ``spill_dir/pid=<p>/run_*.parquet``
    (the reference's LoadFromBook per-cluster read, inverted for build)."""

    def encode_from_spill(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch["pid"].to_pylist():
            files = sorted(glob.glob(os.path.join(spill_dir, f"pid={p}", "run_*.parquet")))
            if not files:
                continue
            tbl = pa.concat_tables([pq.read_table(f) for f in files])
            tbl = tbl.append_column(
                "pid", pa.array(np.full(tbl.num_rows, p, dtype=np.int64))
            )
            outs.append(encoder(tbl))
        if not outs:
            return pa.table(
                {
                    "pid": pa.array([], type=pa.int64()),
                    "n_terms": pa.array([], type=pa.int64()),
                    "n_postings": pa.array([], type=pa.int64()),
                    "n_blocks": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    return encode_from_spill
