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

import numpy as np
import pandas as pd
import pyarrow as pa

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
    input (which collapsed parallelism to 2 tasks), and (b) never ships
    the unpartitioned postings through the object store."""

    def __init__(self, stats_ref, cfg: PipelineConfig, doc_id_space: int):
        self._assigner = PartitionAssigner(stats_ref, cfg, doc_id_space)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._assigner(tokenize_postings_batch(batch))


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
        terms = pd.Series(batch["term"].to_pylist(), dtype=object)
        pid = terms.map(self.pid_map)
        if self.salts:
            doc_ids = batch["doc_id"].to_numpy()
            for t, pids in self.salt_pids.items():
                m = (terms == t).to_numpy()
                if m.any():
                    s = salt_of_doc_ids(doc_ids[m], len(pids), self.doc_id_space)
                    pid.values[m] = pids[s]
        if pid.isna().any():  # term unseen in stats (shouldn't happen same-corpus)
            missing = terms[pid.isna()]
            pid[pid.isna()] = missing.map(
                lambda t: term_partition(t, self.cfg.num_partitions)
            )
        return batch.append_column("pid", pa.array(pid.astype(np.int64).values))


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
