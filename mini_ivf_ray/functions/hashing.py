"""Stable, portable hashing.

md5 is used (not Python ``hash``) because it is deterministic across
processes/nodes and reproducible in DuckDB (``md5(expr)``), which the
driver's SQL oracles rely on.  These run once per distinct url/term, not
per posting, so speed is not critical.

Reference analog: positional row ids (index_ivf.cpp:86-92).  Positional
ids are unstable under Ray's nondeterministic block order, so docID is a
64-bit hash of the url instead; collisions are checked during the
url-dedup shuffle (stages/prepare.py ``_keep_latest`` — colliding ids
share a dedup bucket, so the per-bucket check is globally complete),
with a backstop duplicate-doc_id ValueError in the partition encoder.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64_MASK = (1 << 64) - 1


def md5_u64(s: str) -> int:
    """First 16 hex chars of md5 as uint64 (as int).  DuckDB equivalent:
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def md5_u32(s: str) -> int:
    """First 8 hex chars of md5 as uint32."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def doc_ids_from_urls(urls) -> np.ndarray:
    """Vector of uint64 docIDs for an iterable of url strings."""
    return np.fromiter(
        (md5_u64(u) for u in urls), dtype=np.uint64, count=len(urls)
    )


def term_partition(term: str, num_partitions: int) -> int:
    """Base partition of a term: md5-hash mod P (replaces the coarse
    k-means assignment ``cq_->predict_one``, quantizer.cpp:41-46 — term
    identity replaces geometry)."""
    return md5_u32(term) % num_partitions


def salt_bounds(nsalt: int, doc_id_space: int) -> np.ndarray:
    """Exact uint64 doc_id range boundaries for ``nsalt`` salt sub-lists
    over [0, doc_id_space).  Sub-list s covers [bounds[s-1], bounds[s])
    (with implicit 0 and doc_id_space at the ends).  Assigner and
    encoder MUST share these exact integers — float arithmetic near the
    boundaries would let a posting block leak across a range held by
    another partition."""
    return np.array(
        [(s * doc_id_space) // nsalt for s in range(1, nsalt)], dtype=np.uint64
    )


def salt_of_doc_ids(doc_ids: np.ndarray, nsalt: int, doc_id_space: int) -> np.ndarray:
    """Vectorized exact salt index per doc_id (uint64 comparisons)."""
    bounds = salt_bounds(nsalt, doc_id_space)
    return np.searchsorted(bounds, doc_ids.astype(np.uint64, copy=False), side="right")


def salted_partition(term: str, salt: int, num_partitions: int) -> int:
    """Partition for salt sub-list ``salt`` of a hot term.  Sub-lists
    spread over distinct partitions via a fixed odd stride so one head
    term cannot overwhelm a single reducer."""
    return (md5_u32(term) + salt * 2654435761) % num_partitions
