"""Segment reading: partition-selective posting-list access.

Reference analog: ``LoadFromBook`` — given a book of cluster ids, load
only those clusters' shard files (index_ivfpq.cpp:122-159).  Ours reads
only the ``segments/part=<p>`` directories that the query's terms live
in, batching all wanted terms of a partition into ONE filtered Parquet
read, and caches per-term block sets (LRU) plus lazily-decoded
per-block posting arrays with precomputed BM25 contributions (which are
constant per index: f(tf, dl, df, N, avgdl, k1, b)).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mini_ivf_ray.functions.codec import decode_block
from mini_ivf_ray.state.manifest import partition_dir


class PostingBlocks:
    """All blocks of one term, ordered by first_doc_id (globally sorted,
    disjoint ranges — guaranteed by range-salting).  Decoding is lazy
    per block and cached; contributions are float64 BM25 per posting."""

    __slots__ = (
        "term", "df", "firsts", "lasts", "counts", "max_scores", "payloads",
        "_docs", "_contribs", "_scoring", "_all",
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

    @property
    def n_blocks(self) -> int:
        return len(self.counts)

    @property
    def n_postings(self) -> int:
        return int(self.counts.sum()) if self.n_blocks else 0

    def set_scoring(self, idf: float, avgdl: float, k1: float, b: float) -> None:
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
        if self._all is None:
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
        return decode_block(self.payloads[i], int(self.firsts[i]), int(self.counts[i]))

    def decode_all(self) -> None:
        """Decode every block in one shot: varint streams are
        self-delimiting, so ONE vectorized decode over the concatenated
        payloads replaces n_blocks separate passes; contributions are one
        tf_norm call over all postings.  Fills the per-block caches."""
        if self.payloads is None:
            return  # pre-decoded views
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


class SegmentReader:
    """Per-process segment accessor with an LRU term cache.

    Reference analog: the loaded ``IndexIVFPQ`` object sharing posting
    lists across query threads (index_ivfpq.hpp:64-159); the LRU is the
    book-eviction pattern of LoadFromBook (index_ivfpq.cpp:140-154).
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
            path = os.path.join(partition_dir(self.index_dir, p), "postings.parquet")
            if os.path.exists(path):
                tbl = pq.read_table(path)
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
            blocks = (
                _blocks_from_table(term, pa.concat_tables(pieces)) if pieces else None
            )
            self._insert(term, blocks)
            out[term] = blocks
        return out

    def term_blocks(self, term: str, locations: list[int]) -> PostingBlocks | None:
        return self.fetch_terms({term: locations})[term]
