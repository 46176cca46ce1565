"""Pipeline configuration — the tuning surface of the engine.

Reference analog: ``IVFConfig`` / ``IVFPQConfig`` structs
(index_ivf.hpp:28-41, index_ivfpq.hpp:34-48) which carry N, D, kc
(number of coarse partitions), PQ geometry and paths.  Ours carries the
fulltext equivalents: partition count, posting-block size, BM25
parameters, skew-salting thresholds and Ray execution knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- partitioning (reference: kc coarse centroids) -------------------
    num_partitions: int = 8
    """Term partitions; each becomes one segment directory.  At cluster
    scale set to O(nodes * few); groups must stream through one task."""

    # --- posting block geometry (reference: PQ code packing) -------------
    block_size: int = 512
    """Postings per compressed block; per-block max-score metadata makes
    this the WAND skipping granularity (analog of per-list PQ payload).
    Classic C engines use 64-128 for maximum pruning; here evaluation is
    vectorized numpy per block while round bookkeeping is Python, so
    larger blocks win — pruning granularity is traded for ~4x fewer
    per-round overheads."""

    # --- BM25 (reference: L2 distance kernel, distance.cpp) --------------
    k1: float = 1.2
    b: float = 0.75

    # --- skew handling (north_star: salted skew-splitting of head terms) -
    hot_df_threshold: int = 250_000
    """Terms with df above this are salted: their postings are split by
    doc_id range into ceil(df / hot_df_threshold) sub-lists that build
    independently on different partitions.  Sub-lists cover disjoint,
    ordered doc_id ranges, so the merged posting list is just the block
    sequence ordered by first_doc_id (no re-sort)."""

    # --- query ----------------------------------------------------------
    topk: int = 10
    taat_threshold: int = 4_000_000
    """Total query postings below which evaluation goes term-at-a-time
    (fully vectorized exact scoring) instead of block-max WAND.  Both
    paths are bit-identical; this is the classic TAAT/DAAT cost-model
    switch — WAND's per-round bookkeeping only pays for itself on long
    posting lists.  0 forces WAND everywhere (used in tests)."""

    # --- execution knobs ------------------------------------------------
    tokenize_batch_size: int = 1024
    """Rows per batch in the extract/tokenize stages.  html is wide
    (binary blobs); keep batches modest so block size limits hold."""
    spill_batch_size: int = 16384
    """Docs per batch in the SPIMI spill stage — one run file per batch
    (one row group per partition inside it), so this trades run-file
    count (encoder footer-scan fan-in) against spill-task memory."""
    query_concurrency: int = 4
    """Searcher actor-pool size for query serving."""

    # --- docID ----------------------------------------------------------
    doc_id_from_url: bool = True
    """True: doc_id = stable 64-bit hash of url (md5 prefix), the
    replacement for the reference's positional row index
    (index_ivf.cpp:86-92) which is unstable under Ray block order.
    False: the input already carries a unique int64 ``doc_id``."""

    stopwords: frozenset[str] = field(
        default_factory=lambda: frozenset({"the", "a", "an", "and", "of", "to", "in"})
    )

    @classmethod
    def from_index(cls, index_dir: str, **overrides) -> "PipelineConfig":
        """Config matching a committed index's manifest — partitioning,
        block size, BM25 params and salt threshold MUST match the build
        or term_locations silently point at the wrong partitions."""
        import json
        import os

        with open(os.path.join(index_dir, "manifest.json")) as f:
            meta = json.load(f)
        c = meta["lineage"]["config"]
        fields = dict(
            num_partitions=c["num_partitions"],
            block_size=c["block_size"],
            k1=c["k1"],
            b=c["b"],
            hot_df_threshold=c["hot_df_threshold"],
        )
        fields.update(overrides)
        return cls(**fields)

    def salts_for_df(self, df: int) -> int:
        """Number of doc_id-range sub-lists for a term with document
        frequency ``df`` (1 = not salted)."""
        if df <= self.hot_df_threshold:
            return 1
        return -(-df // self.hot_df_threshold)
