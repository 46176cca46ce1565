"""Segment reading: partition-selective posting-list access.

Reference analog: ``LoadFromBook`` — given a book of cluster ids, load
only those clusters' shard files (index_ivfpq.cpp:122-159).  Ours reads
only the ``segments/part=<p>`` directories that the query's terms live
in, and within a partition file uses Parquet predicate pushdown on the
sorted ``term`` column to touch only the needed row groups.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from mini_ivf_ray.functions.codec import decode_block
from mini_ivf_ray.state.manifest import partition_dir


class PostingBlocks:
    """All blocks of one term, ordered by first_doc_id (globally sorted,
    disjoint ranges — guaranteed by range-salting)."""

    __slots__ = ("term", "df", "firsts", "lasts", "counts", "max_scores", "payloads")

    def __init__(self, term, df, firsts, lasts, counts, max_scores, payloads):
        self.term = term
        self.df = df
        self.firsts = firsts
        self.lasts = lasts
        self.counts = counts
        self.max_scores = max_scores
        self.payloads = payloads

    @property
    def n_blocks(self) -> int:
        return len(self.payloads)

    @property
    def n_postings(self) -> int:
        return int(self.counts.sum()) if self.n_blocks else 0

    def decode(self, i: int):
        return decode_block(self.payloads[i], int(self.firsts[i]), int(self.counts[i]))


class SegmentReader:
    """Per-process segment accessor with an LRU term cache.

    Reference analog: the loaded ``IndexIVFPQ`` object sharing posting
    lists across query threads (index_ivfpq.hpp:64-159); the LRU is the
    book-eviction pattern of LoadFromBook (index_ivfpq.cpp:140-154).
    """

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        self.index_dir = index_dir
        self.cache_terms = cache_terms
        self._cache: OrderedDict[str, PostingBlocks | None] = OrderedDict()
        self._paths: dict[int, str | None] = {}

    def _partition_path(self, p: int) -> str | None:
        if p not in self._paths:
            path = os.path.join(partition_dir(self.index_dir, p), "postings.parquet")
            self._paths[p] = path if os.path.exists(path) else None
        return self._paths[p]

    def term_blocks(self, term: str, locations: list[int]) -> PostingBlocks | None:
        """Fetch+merge a term's blocks from its partitions.  Merge =
        sort blocks by first_doc_id (ranges are disjoint)."""
        hit = self._cache.get(term, False)
        if hit is not False:
            self._cache.move_to_end(term)
            return hit
        tables = []
        for p in dict.fromkeys(locations):  # dedupe, keep order
            path = self._partition_path(p)
            if path is None:
                continue
            tbl = pq.read_table(path, filters=[("term", "==", term)])
            if tbl.num_rows:
                tables.append(tbl)
        if not tables:
            blocks = None
        else:
            import pyarrow as pa

            tbl = pa.concat_tables(tables)
            firsts = tbl["first_doc_id"].to_numpy()
            order = np.argsort(firsts, kind="stable")
            blocks = PostingBlocks(
                term=term,
                df=int(tbl["df"][0].as_py()) if len(tables) == 1 else int(
                    pc.max(tbl["df"]).as_py()
                ),
                firsts=firsts[order],
                lasts=tbl["last_doc_id"].to_numpy()[order],
                counts=tbl["count"].to_numpy()[order],
                max_scores=tbl["max_score"].to_numpy()[order],
                payloads=[tbl["payload"][int(i)].as_py() for i in order],
            )
        self._cache[term] = blocks
        if len(self._cache) > self.cache_terms:
            self._cache.popitem(last=False)
        return blocks
