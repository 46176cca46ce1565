"""Segment reading: partition-selective posting-list access.

Reference analog: ``LoadFromBook`` — given a book of cluster ids, load
only those clusters' shard files (index_ivfpq.cpp:122-159).  Ours reads
only the ``segments/part=<p>`` directories that the query's terms live
in, batching all wanted terms of a partition into ONE filtered Parquet
read, and caches per-term block sets (LRU) plus lazily-decoded
per-block posting arrays with precomputed BM25 contributions (which are
constant per index: f(tf, dl, df, N, avgdl, k1, b)).

Multi-epoch partitions (incremental append, pipelines/append.py): a
partition directory may hold several segment files —
``postings.parquet`` plus ``postings_inc<k>.parquet`` per increment.
Payload bytes are stats-free (doc deltas, tf, dl), but the stored
per-block ``max_score`` bakes the global statistics of its encode
epoch, which go stale the moment an increment changes n_docs / avgdl /
df.  On such indexes the reader therefore never trusts stored bounds:
a term's rows are eagerly decoded (one vectorized varint pass), merged
across epochs into one doc-sorted run, and re-blocked with EXACT
per-block maxima computed from the current statistics at scoring time
(``PostingBlocks.from_raw``).  Fresh single-epoch indexes keep the
lazy stored-bound path byte-for-byte.
"""

from __future__ import annotations

import glob
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.functions.codec import decode_block
from mini_ivf_ray.state.manifest import partition_dir


def segment_files_in_dir(part_dir: str) -> list[str]:
    """Ordered segment files in one partition directory: the base epoch
    first, then increments in commit order (zero-padded names sort)."""
    base = os.path.join(part_dir, "postings.parquet")
    incs = sorted(glob.glob(os.path.join(part_dir, "postings_inc*.parquet")))
    return ([base] if os.path.exists(base) else []) + incs


def partition_segment_files(index_dir: str, p: int) -> list[str]:
    return segment_files_in_dir(partition_dir(index_dir, p))


def read_partition_table(index_dir: str, p: int) -> pa.Table | None:
    """All block rows of one partition, term-contiguous.

    Single-epoch partitions return the file's table unchanged (the
    encoder wrote it term-sorted).  Multi-epoch partitions concatenate
    every segment file and re-sort rows by (term, first_doc_id) so a
    term's rows are again one contiguous slice — block doc ranges may
    OVERLAP across epochs, which the fetch path resolves by eager
    decode + merge (see module docstring)."""
    files = partition_segment_files(index_dir, p)
    if not files:
        return None
    if len(files) == 1:
        return pq.read_table(files[0])
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    order = pa.compute.sort_indices(
        tbl,
        sort_keys=[("term", "ascending"), ("first_doc_id", "ascending")],
    )
    return tbl.take(order)


class PostingBlocks:
    """All blocks of one term, ordered by first_doc_id (globally sorted,
    disjoint ranges — guaranteed by range-salting).  Decoding is lazy
    per block and cached; contributions are float64 BM25 per posting.

    Three storage modes:
    * payload  — encoded varint blocks straight from a segment file;
      stored ``max_scores`` are trusted (single-epoch indexes only).
    * views    — pre-decoded (docs, contribs) numpy views (the shared
      decoded-index path); bounds were recomputed at decode time.
    * raw      — merged (docs, tf, dl) arrays from a multi-epoch
      partition; blocks are synthetic ``block_size`` tilings and the
      per-block maxima are computed EXACTLY from the current statistics
      in ``set_scoring`` (stored bounds are stale on such indexes).
    """

    __slots__ = (
        "term", "df", "firsts", "lasts", "counts", "max_scores", "payloads",
        "_docs", "_contribs", "_scoring", "_all", "_raw",
    )

    def __init__(self, term, df, firsts, lasts, counts, max_scores, payloads):
        self.term = term
        self.df = df
        self.firsts = firsts
        self.lasts = lasts
        self.counts = counts
        self.max_scores = max_scores
        self.payloads = payloads
        n = len(counts) if payloads is None else len(payloads)
        self._docs: list = [None] * n
        self._contribs: list = [None] * n
        self._scoring = None  # (idf, avgdl, k1, b) set by the searcher
        self._all = None  # cached (docs, contribs) over ALL blocks
        self._raw = None  # (tfs, dls) for raw mode

    @classmethod
    def from_views(cls, term, df, firsts, lasts, counts, max_scores, docs_views, contrib_views):
        """Pre-decoded blocks: per-block (docs, contribs) numpy views —
        typically zero-copy slices of plasma-shared arrays.  No payloads;
        scoring is already baked into the contributions."""
        b = cls(term, df, firsts, lasts, counts, max_scores, payloads=None)
        b._docs = list(docs_views)
        b._contribs = list(contrib_views)
        b._scoring = "baked"
        return b

    @classmethod
    def from_raw(cls, term, df, docs, tfs, dls, block_size: int = 128):
        """Merged doc-sorted raw postings of one term (multi-epoch
        partitions).  Synthetic block boundaries are fixed at
        construction (they don't depend on statistics); contributions
        and EXACT per-block maxima are computed in ``set_scoring``."""
        n = int(docs.size)
        if n and not np.all(docs[1:] > docs[:-1]):
            raise ValueError(
                f"from_raw: doc_ids for term {term!r} are not strictly "
                "increasing — duplicate document across epochs?"
            )
        starts = np.arange(0, n, block_size, dtype=np.int64)
        ends = np.minimum(starts + block_size, n)
        b = cls(
            term,
            df,
            firsts=docs[starts] if n else np.empty(0, dtype=np.uint64),
            lasts=docs[ends - 1] if n else np.empty(0, dtype=np.uint64),
            counts=(ends - starts),
            max_scores=None,  # exact, from current stats, in set_scoring
            payloads=None,
        )
        b._raw = (tfs, dls)
        b._docs = [docs[a:z] for a, z in zip(starts, ends)]
        b._contribs = [None] * len(starts)
        b._scoring = None
        # keep the full arrays for the one-shot vectorized scoring pass
        b._all = (docs, None)
        return b

    @property
    def n_blocks(self) -> int:
        return len(self.counts)

    @property
    def n_postings(self) -> int:
        return int(self.counts.sum()) if self.n_blocks else 0

    def set_scoring(self, idf: float, avgdl: float, k1: float, b: float) -> None:
        if self._raw is not None:
            if self._scoring == (idf, avgdl, k1, b):
                return
            from mini_ivf_ray.functions import bm25

            self._scoring = (idf, avgdl, k1, b)
            tfs, dls = self._raw
            docs = self._all[0]
            contribs = idf * bm25.tf_norm(tfs, dls, avgdl, k1, b)
            self._all = (docs, contribs)
            off = np.concatenate(
                ([0], np.cumsum(self.counts[:-1]))
            ).astype(np.int64) if self.n_blocks else np.empty(0, dtype=np.int64)
            self._contribs = [
                contribs[a : a + int(c)] for a, c in zip(off, self.counts)
            ]
            # EXACT per-block upper bounds under the CURRENT statistics
            # (max is order-independent, so reduceat is bit-safe here)
            self.max_scores = (
                np.maximum.reduceat(contribs, off)
                if contribs.size
                else np.empty(0, dtype=np.float64)
            )
            return
        if self.payloads is None:
            return  # pre-decoded views: contributions are baked in
        if self._scoring != (idf, avgdl, k1, b):
            self._scoring = (idf, avgdl, k1, b)
            self._docs = [None] * self.n_blocks
            self._contribs = [None] * self.n_blocks
            self._all = None

    def decoded(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, float64 contributions) of block i, cached."""
        docs = self._docs[i]
        if docs is None:
            from mini_ivf_ray.functions import bm25

            docs, tfs, dls = decode_block(
                self.payloads[i], int(self.firsts[i]), int(self.counts[i])
            )
            idf, avgdl, k1, b = self._scoring
            self._docs[i] = docs
            self._contribs[i] = idf * bm25.tf_norm(tfs, dls, avgdl, k1, b)
        return self._docs[i], self._contribs[i]

    def all_postings(self) -> tuple[np.ndarray, np.ndarray]:
        """(docs, contribs) concatenated over every block, cached —
        blocks are disjoint increasing doc ranges, so the concat is
        globally sorted.  The TAAT evaluation path consumes this."""
        if self._all is None or self._all[1] is None:
            if self.n_blocks == 0:
                self._all = (
                    np.empty(0, dtype=np.uint64),
                    np.empty(0, dtype=np.float64),
                )
            else:
                self.decode_all()
                self._all = (
                    np.concatenate(self._docs),
                    np.concatenate(self._contribs),
                )
        return self._all

    def decode_raw(self, i: int):
        """(doc_ids, tf, dl) of block i (no scoring context needed)."""
        if self._raw is not None:
            a = int(self.counts[:i].sum())
            z = a + int(self.counts[i])
            tfs, dls = self._raw
            return self._docs[i], tfs[a:z], dls[a:z]
        return decode_block(self.payloads[i], int(self.firsts[i]), int(self.counts[i]))

    def decode_all(self) -> None:
        """Decode every block in one shot: varint streams are
        self-delimiting, so ONE vectorized decode over the concatenated
        payloads replaces n_blocks separate passes; contributions are one
        tf_norm call over all postings.  Fills the per-block caches."""
        if self.payloads is None:
            return  # pre-decoded views / raw mode
        if self.n_blocks == 0 or self._docs[-1] is not None and all(
            d is not None for d in self._docs
        ):
            return
        from mini_ivf_ray.functions import bm25
        from mini_ivf_ray.functions.codec import decode_varints

        vals = decode_varints(np.concatenate(
            [np.frombuffer(p, dtype=np.uint8) for p in self.payloads]
        ))
        idf, avgdl, k1, b = self._scoring
        off = 0
        for i in range(self.n_blocks):
            n = int(self.counts[i])
            seg = vals[off : off + 3 * n - 1]
            off += 3 * n - 1
            docs = np.empty(n, dtype=np.uint64)
            docs[0] = self.firsts[i]
            if n > 1:
                docs[1:] = np.uint64(self.firsts[i]) + np.cumsum(seg[: n - 1])
            tfs = seg[n - 1 : 2 * n - 1].astype(np.int64)
            dls = seg[2 * n - 1 :].astype(np.int64)
            self._docs[i] = docs
            self._contribs[i] = idf * bm25.tf_norm(tfs, dls, avgdl, k1, b)

    def subset_range(self, lo: int, hi: int):
        """Blocks overlapping docID range [lo, hi] as a new
        PostingBlocks, or None (doc-sharded serving).  Payload blocks
        are subset whole (boundary docs outside the range score
        partially and are max-merged away, pipelines/serving.py); raw
        blocks trim postings exactly to the range — each doc then scores
        fully in precisely its home shard."""
        if self._raw is not None:
            docs = self._all[0]
            a = int(np.searchsorted(docs, np.uint64(lo), side="left"))
            z = int(np.searchsorted(docs, np.uint64(hi), side="right"))
            if z <= a:
                return None
            tfs, dls = self._raw
            bs = int(self.counts.max()) if self.n_blocks else 128
            return PostingBlocks.from_raw(
                self.term, self.df, docs[a:z], tfs[a:z], dls[a:z], block_size=bs
            )
        m = (self.lasts >= np.uint64(lo)) & (self.firsts <= np.uint64(hi))
        if not m.any():
            return None
        idx = np.flatnonzero(m)
        out = PostingBlocks(
            term=self.term,
            df=self.df,
            firsts=self.firsts[idx],
            lasts=self.lasts[idx],
            counts=self.counts[idx],
            max_scores=self.max_scores[idx],
            payloads=(
                [self.payloads[int(i)] for i in idx]
                if self.payloads is not None
                else None
            ),
        )
        if self.payloads is None:  # views mode: carry the decoded views
            out._docs = [self._docs[int(i)] for i in idx]
            out._contribs = [self._contribs[int(i)] for i in idx]
            out._scoring = "baked"
        return out


def _blocks_from_table(term: str, tbl: pa.Table) -> PostingBlocks:
    firsts = tbl["first_doc_id"].to_numpy()
    order = np.argsort(firsts, kind="stable")
    payloads = tbl["payload"].to_pylist()
    return PostingBlocks(
        term=term,
        df=int(tbl["df"][0].as_py()),
        firsts=firsts[order],
        lasts=tbl["last_doc_id"].to_numpy()[order],
        counts=tbl["count"].to_numpy()[order],
        max_scores=tbl["max_score"].to_numpy()[order],
        payloads=[payloads[int(i)] for i in order],
    )


def _raw_blocks_from_table(
    term: str, tbl: pa.Table, df: int, block_size: int
) -> PostingBlocks:
    """Multi-epoch term rows -> one merged doc-sorted raw run.  One
    vectorized decode of every payload (stages/spimi.decode_block_table),
    one sort by doc_id, exact bounds recomputed at scoring time."""
    from mini_ivf_ray.stages.spimi import decode_block_table

    _, docs, tfs, dls = decode_block_table(
        tbl.select(["term", "first_doc_id", "count", "payload"])
    )
    order = np.argsort(docs, kind="stable")
    return PostingBlocks.from_raw(
        term, df, docs[order], tfs[order], dls[order], block_size=block_size
    )


class SegmentReader:
    """Per-process segment accessor with an LRU term cache.

    Reference analog: the loaded ``IndexIVFPQ`` object sharing posting
    lists across query threads (index_ivfpq.hpp:64-159); the LRU is the
    book-eviction pattern of LoadFromBook (index_ivfpq.cpp:140-154).

    ``exact_bounds=False`` (set automatically when the index manifest
    records an incremental append) switches every fetched term to the
    eager-decode raw path: stored per-block max_scores bake a stale
    epoch's statistics and cannot be trusted as upper bounds, so WAND
    bounds are recomputed exactly from the current statistics instead.
    """

    def __init__(
        self,
        index_dir: str,
        cache_terms: int = 16384,
        cache_partitions: int = 64,
        shared_tables: dict | None = None,
    ):
        self.index_dir = index_dir
        self.cache_terms = cache_terms
        self.cache_partitions = cache_partitions
        self._cache: OrderedDict[str, PostingBlocks | None] = OrderedDict()
        # Optional {pid: ObjectRef[pa.Table]}: segment tables published
        # once to the object store (see pipelines.query.share_segments)
        # and mapped zero-copy by every searcher actor on the node —
        # without it each actor re-reads + re-decompresses every
        # partition file it touches.
        self._shared = shared_tables or {}
        # partition-table cache: pid -> (table, {term: (row_start, row_end)})
        # Block rows are written term-sorted, so a term's rows are one
        # contiguous zero-copy slice.  LRU-bounded: at cluster scale an
        # actor serves a subset of partitions and this holds its working
        # set; cold partitions fall back to filtered reads on re-probe.
        self._parts: OrderedDict[int, tuple[pa.Table, dict] | None] = OrderedDict()
        self.exact_bounds, self.block_size = _index_bound_state(index_dir)

    def _partition(self, p: int):
        hit = self._parts.get(p, False)
        if hit is not False:
            self._parts.move_to_end(p)
            return hit
        tbl = None
        if p in self._shared:
            import ray

            tbl = ray.get(self._shared[p])  # zero-copy plasma mapping
        if tbl is None:
            tbl = read_partition_table(self.index_dir, p)
        if tbl is None:
            entry = None
        else:
            terms = tbl["term"].to_pylist()
            index: dict[str, tuple[int, int]] = {}
            start = 0
            for i in range(1, len(terms) + 1):
                if i == len(terms) or terms[i] != terms[start]:
                    index[terms[start]] = (start, i)
                    start = i
            entry = (tbl, index)
        self._parts[p] = entry
        if len(self._parts) > self.cache_partitions:
            self._parts.popitem(last=False)
        return entry

    def _insert(self, term: str, blocks: PostingBlocks | None) -> None:
        self._cache[term] = blocks
        if len(self._cache) > self.cache_terms:
            self._cache.popitem(last=False)

    def fetch_terms(self, wanted: dict[str, list[int]]) -> dict[str, PostingBlocks | None]:
        """Batch fetch: {term: ordered partition locations} -> blocks,
        served from the partition-table cache by zero-copy slice."""
        out: dict[str, PostingBlocks | None] = {}
        for term, locs in wanted.items():
            hit = self._cache.get(term, False)
            if hit is not False:
                self._cache.move_to_end(term)
                out[term] = hit
                continue
            pieces = []
            for p in dict.fromkeys(locs):
                entry = self._partition(p)
                if entry is None:
                    continue
                tbl, index = entry
                rng = index.get(term)
                if rng is not None:
                    pieces.append(tbl.slice(rng[0], rng[1] - rng[0]))
            if not pieces:
                blocks = None
            elif self.exact_bounds:
                blocks = _blocks_from_table(term, pa.concat_tables(pieces))
            else:
                cat = pa.concat_tables(pieces)
                blocks = _raw_blocks_from_table(
                    term,
                    cat,
                    df=int(cat["count"].to_numpy().sum()),
                    block_size=self.block_size,
                )
            self._insert(term, blocks)
            out[term] = blocks
        return out

    def term_blocks(self, term: str, locations: list[int]) -> PostingBlocks | None:
        return self.fetch_terms({term: locations})[term]


def _index_bound_state(index_dir: str) -> tuple[bool, int]:
    """(stored max_scores trustworthy?, configured block size).

    Bounds are exact only while every segment was encoded under the
    CURRENT global statistics — i.e. until the first incremental append
    (a full-rewrite append re-encodes everything, keeping bounds
    exact).  ``compact_index`` rewrites the segments and restores
    exactness."""
    from mini_ivf_ray.state.manifest import read_index_manifest

    man = read_index_manifest(index_dir) or {}
    lineage = man.get("lineage", {})
    # the committer records bounds_exact explicitly (incremental append
    # -> False; rewrite append / compaction -> True; absent on fresh
    # builds -> True)
    exact = bool(lineage.get("bounds_exact", True))
    block_size = int(lineage.get("config", {}).get("block_size", 128) or 128)
    return exact, block_size
