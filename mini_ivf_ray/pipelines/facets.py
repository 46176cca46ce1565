"""Faceted search: per-query facet-value counts over the FULL match
set (the "n results per language / domain / year" panel every search
UI renders next to the top-k list).

Reference analogy: mini-ivf's QueryObs walks each query's candidate
clusters and histograms ground-truth hits per cluster
(index_ivfpq.cpp:412-470); a facet panel is the same shape — a
per-query histogram over a doc attribute of the match set — promoted
to a first-class query result.

Scale shape (10^12 docs): the facet sidecar is (doc_id, code) sorted
by doc id, partitioned on exactly the index's doc-sharding ranges, so
in doc-sharded serving (serving.ShardedIndex) every shard counts its
own range locally and the merge is (queries x facet-cardinality)
rows — never doc-proportional.  In the single-index path below the
sidecar is broadcast ONCE via ``ray.put`` (two numpy arrays, zero-copy
to every actor), never re-shipped per batch.  Counting is exact and
integer, so results are engine-order-independent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.pipelines.query import BM25Searcher


class FacetCounter(BM25Searcher):
    """Actor-pool stage: (query_id, text) batches -> (query_id, facet,
    n_docs) rows, counting every document that matches ANY query term
    (disjunctive match semantics — the set BM25 ranks over).  Facet
    values with zero matches are omitted, mirroring SQL GROUP BY."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        facet_ref=None,
        facet_labels: list[str] | None = None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, codes = (
            ray.get(facet_ref)
            if isinstance(facet_ref, ray.ObjectRef)
            else facet_ref
        )
        self.facet_ids = np.asarray(ids, dtype=np.uint64)
        self.facet_codes = np.asarray(codes, dtype=np.int64)
        self.facet_labels = list(facet_labels or [])
        if not np.all(self.facet_ids[:-1] < self.facet_ids[1:]):
            raise ValueError("facet sidecar must be sorted by unique doc_id")

    def disjunctive_matches_for_text(self, qtext: str) -> np.ndarray:
        """Sorted unique doc ids containing at least one query term."""
        from mini_ivf_ray.functions.tokenize import tokenize

        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        blocks = [b for b in fetched.values() if b is not None and b.n_blocks]
        if not blocks:
            return np.empty(0, dtype=np.uint64)
        for b in blocks:
            b.set_scoring(
                bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
        parts = [b.all_postings()[0] for b in blocks]
        self.counters["searched_cnt"] = self.counters.get(
            "searched_cnt", 0
        ) + sum(p.size for p in parts)
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        docs = (
            parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
        )
        if self.denied is not None and self.denied.size:
            # tombstoned docs are unreachable by search, so the facet
            # panel must not count them either (live-docs consistency)
            from mini_ivf_ray.pipelines.query import _allowed_mask

            docs = docs[~_allowed_mask(docs, self.denied)]
        return docs

    def facet_counts_for_text(self, qtext: str) -> np.ndarray:
        """len(facet_labels) exact match counts for one query."""
        docs = self.disjunctive_matches_for_text(qtext)
        n_labels = len(self.facet_labels)
        if not docs.size:
            return np.zeros(n_labels, dtype=np.int64)
        idx = np.searchsorted(self.facet_ids, docs)
        np.minimum(idx, self.facet_ids.size - 1, out=idx)
        valid = self.facet_ids[idx] == docs
        return np.bincount(self.facet_codes[idx[valid]], minlength=n_labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, facets, counts = [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = self.facet_counts_for_text(qtext)
            for code in np.flatnonzero(c):
                qids.append(qid)
                facets.append(self.facet_labels[code])
                counts.append(int(c[code]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "facet": pa.array(facets, type=pa.string()),
                "n_docs": pa.array(counts, type=pa.int64()),
            }
        )


def faceted_search(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> facet panel (query_id, facet,
    n_docs): for each query, how many documents matching ANY query
    term carry each facet value.

    ``facet_ids`` / ``facet_values`` are the doc-id -> attribute
    sidecar (e.g. documents.doc_id / documents.lang).  Values are
    dictionary-encoded driver-side (facet cardinality is panel-sized
    by definition) and the two arrays are broadcast once via
    ``ray.put``.  ``respect_deletes`` (default) excludes the index's
    persisted tombstones from the counts — the panel agrees with what
    search can return."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(facet_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(np.asarray(facet_values, dtype=object)[order], type=pa.string())
    if vals.null_count:
        # same null hazard as collapse.py: a null dictionary-encodes to
        # a null index -> garbage int64 code; refuse loudly
        raise ValueError(
            f"facet_values contains {vals.null_count} null(s); "
            "map nulls to a sentinel label before faceting"
        )
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    import ray

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    facet_ref = ray.put((ids, codes))
    return queries_ds.map_batches(
        FacetCounter,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, facet_ref, labels, denied_ref,
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class SamplerFacetCounter(FacetCounter):
    """ES ``sampler`` aggregation (single-index analog): the facet
    sub-aggregation runs over only the ``sample_size`` BEST-SCORING
    matches — exact full-TAAT BM25 scores, (score desc, doc_id asc)
    tiebreak, so the sample is deterministic and SQL-replayable.  ES's
    own sampler is shard-local (top shard_size per shard, results
    depend on sharding); this analog samples the GLOBAL top so the
    oracle can pin it exactly — a sharded deployment that wants ES's
    literal behavior takes each shard's local top instead (the counts
    then merge additively, like facet_counts_batch)."""

    def __init__(self, *args, sample_size: int = 100, **kwargs):
        super().__init__(*args, **kwargs)
        if sample_size < 1:
            raise ValueError(f"sample_size must be >= 1, got {sample_size}")
        self.sample_size = int(sample_size)

    def _scored_live_matches(self, qtext: str):
        """(docs, scores) of the full accumulated match set with
        tombstones masked — the shared walk under every sampler."""
        from mini_ivf_ray.pipelines.query import (
            _allowed_mask,
            _taat_accumulate,
        )
        from mini_ivf_ray.functions.tokenize import tokenize

        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        blocks = []
        for t in sorted(wanted):
            b = fetched.get(t)
            if b is None or not b.n_blocks:
                continue
            b.set_scoring(
                bm25.idf(self.stats.df[t], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            blocks.append(b)
        if not blocks:
            return (
                np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.float64),
            )
        docs, scores, scored = _taat_accumulate(blocks)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if self.denied is not None and self.denied.size:
            keep = ~_allowed_mask(docs, self.denied)
            docs, scores = docs[keep], scores[keep]
        return docs, scores

    def sampled_counts_for_text(self, qtext: str) -> np.ndarray:
        from mini_ivf_ray.pipelines.query import _topk_exact

        n_labels = len(self.facet_labels)
        docs, scores = self._scored_live_matches(qtext)
        if not docs.size:
            return np.zeros(n_labels, dtype=np.int64)
        top = _topk_exact(docs, scores, self.sample_size)
        sample = np.sort(np.array([d for d, _ in top], dtype=np.uint64))
        idx = np.searchsorted(self.facet_ids, sample)
        np.minimum(idx, self.facet_ids.size - 1, out=idx)
        valid = self.facet_ids[idx] == sample
        return np.bincount(self.facet_codes[idx[valid]], minlength=n_labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, facets, counts = [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = self.sampled_counts_for_text(qtext)
            for code in np.flatnonzero(c):
                qids.append(qid)
                facets.append(self.facet_labels[code])
                counts.append(int(c[code]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "facet": pa.array(facets, type=pa.string()),
                "n_docs": pa.array(counts, type=pa.int64()),
            }
        )


def sampler_facets(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    cfg: PipelineConfig | None = None,
    sample_size: int = 100,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> facet panel over only the
    ``sample_size`` best-scoring matches per query (ES sampler +
    terms sub-aggregation).  Deployment identical to faceted_search;
    the counts per query sum to min(sample_size, |match set|)."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(facet_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(
        np.asarray(facet_values, dtype=object)[order], type=pa.string()
    )
    if vals.null_count:
        raise ValueError(
            f"facet_values contains {vals.null_count} null(s); "
            "map nulls to a sentinel label before faceting"
        )
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    import ray

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    facet_ref = ray.put((ids, codes))
    return queries_ds.map_batches(
        SamplerFacetCounter,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, facet_ref, labels, denied_ref,
        ),
        fn_constructor_kwargs={"sample_size": sample_size},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class DiversifiedSamplerCounter(SamplerFacetCounter):
    """ES ``diversified_sampler`` + terms sub-aggregation: the sample
    is the best-scoring matches with AT MOST ``max_per`` docs sharing
    any one diversity-field value — the "don't let one domain swamp
    the topical summary" sampler.  ES's greedy walk (admit in score
    order unless the doc's group already holds max_per; stop at
    sample_size) is replayed here in its CLOSED FORM, which is exact
    because a pre-fullness rejection can only be a group-cap
    rejection: rank docs within each group by (score desc, doc asc),
    keep group_rank <= max_per, then cut the overall top sample_size
    under the same order — two window functions the SQL oracle
    replays verbatim.  Same global-not-shard-local divergence as
    SamplerFacetCounter, documented there.

    Two sidecars: the inherited facet sidecar (what the sub-agg
    counts) and the diversity sidecar (what dedups).  A matched doc
    missing the DIVERSITY field is excluded from the sample (this
    repo's sidecar convention), pinned by pytest."""

    def __init__(self, *args, div_ref=None, max_per: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        import ray

        if max_per < 1:
            raise ValueError(f"max_per must be >= 1, got {max_per}")
        self.max_per = int(max_per)
        ids, codes = (
            ray.get(div_ref) if isinstance(div_ref, ray.ObjectRef) else div_ref
        )
        self.div_ids = np.asarray(ids, dtype=np.uint64)
        self.div_codes = np.asarray(codes, dtype=np.int64)
        if self.div_ids.size > 1 and not np.all(
            self.div_ids[:-1] < self.div_ids[1:]
        ):
            raise ValueError("diversity sidecar must be sorted by unique id")

    def sampled_counts_for_text(self, qtext: str) -> np.ndarray:
        n_labels = len(self.facet_labels)
        docs, scores = self._scored_live_matches(qtext)
        if not docs.size or not self.div_ids.size:
            return np.zeros(n_labels, dtype=np.int64)
        di = np.searchsorted(self.div_ids, docs)
        np.minimum(di, self.div_ids.size - 1, out=di)
        has = self.div_ids[di] == docs
        docs, scores = docs[has], scores[has]
        gcodes = self.div_codes[di[has]]
        if not docs.size:
            return np.zeros(n_labels, dtype=np.int64)
        # closed-form greedy: group-rank in (score desc, doc asc)
        # order, cap, then the overall top cut under the same order
        pos = np.lexsort((docs, -scores))
        g_p = gcodes[pos]
        o2 = np.lexsort((np.arange(pos.size), g_p))
        g_s = g_p[o2]
        first = np.ones(g_s.size, dtype=bool)
        first[1:] = g_s[1:] != g_s[:-1]
        starts = np.nonzero(first)[0]
        run = np.cumsum(first) - 1
        rank_in_group = np.arange(g_s.size) - starts[run]
        gr = np.empty(pos.size, dtype=np.int64)
        gr[o2] = rank_in_group
        kept = pos[gr < self.max_per][: self.sample_size]
        sample = np.sort(docs[kept])
        idx = np.searchsorted(self.facet_ids, sample)
        np.minimum(idx, self.facet_ids.size - 1, out=idx)
        valid = self.facet_ids[idx] == sample
        return np.bincount(self.facet_codes[idx[valid]], minlength=n_labels)


def diversified_sampler_facets(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    div_ids,
    div_values,
    cfg: PipelineConfig | None = None,
    sample_size: int = 100,
    max_per: int = 1,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> facet panel over the de-duplicated
    best-scoring sample: at most ``max_per`` docs per diversity value,
    then the top ``sample_size`` overall (ES diversified_sampler +
    terms sub-agg; closed-form greedy, class docstring).  Per-query
    counts sum to <= sample_size AND to <= max_per * |diversity
    cardinality| — both caps pinned by pytest."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(facet_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(
        np.asarray(facet_values, dtype=object)[order], type=pa.string()
    )
    if vals.null_count:
        raise ValueError(
            f"facet_values contains {vals.null_count} null(s); "
            "map nulls to a sentinel label before faceting"
        )
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    d_ids = np.asarray(div_ids, dtype=np.uint64)
    d_order = np.argsort(d_ids, kind="stable")
    d_ids = d_ids[d_order]
    d_vals = pa.array(
        np.asarray(div_values, dtype=object)[d_order], type=pa.string()
    )
    if d_vals.null_count:
        raise ValueError(
            f"div_values contains {d_vals.null_count} null(s); "
            "map nulls to a sentinel label before sampling"
        )
    d_codes = (
        pa.compute.dictionary_encode(d_vals)
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    import ray

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    facet_ref = ray.put((ids, codes))
    div_ref = ray.put((d_ids, d_codes))
    return queries_ds.map_batches(
        DiversifiedSamplerCounter,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, facet_ref, labels, denied_ref,
        ),
        fn_constructor_kwargs={
            "sample_size": sample_size,
            "div_ref": div_ref,
            "max_per": max_per,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


def faceted_search_sharded(
    index_dir: str,
    queries: list[tuple[int, str]],
    facet_ids,
    facet_values,
    cfg: PipelineConfig | None = None,
    num_shards: int = 4,
):
    """Doc-sharded faceted search: the scale path promised in the module
    docstring, now real.  The sidecar is partitioned on the index's
    doc-sharding ranges (serving.ShardedIndex.attach_sidecar) — each
    shard actor holds ONLY its range's (doc_id, code) slice and counts
    locally; the merge sums (query x facet-cardinality) rows.  Results
    are identical to ``faceted_search`` (pytest-pinned); at 10^12 docs
    per-node sidecar memory is corpus/R instead of corpus."""
    from mini_ivf_ray.pipelines.serving import ShardedIndex

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    sharded = ShardedIndex(index_dir, cfg, num_shards=num_shards)
    try:
        sharded.attach_sidecar(facet_ids, facet_values)
        return sharded.facet_search(queries)
    finally:
        sharded.shutdown()


class RandomSamplerFacetCounter(FacetCounter):
    """ES ``random_sampler`` aggregation (8.x): the facet
    sub-aggregation runs over a PROBABILITY-gated subset of the match
    set and reports counts scaled back by 1/p.  The gate is the
    repo's deterministic permille hash (sampling.split_bucket —
    ``h60(doc_id, salt) % 1000 < permille``), so unlike ES's
    per-shard RNG the sample is reproducible and SQL-replayable:
    documented divergence, same shape as the sampler agg's
    global-not-shard-local pin.  Scale note: the gate applies AFTER
    the match-set walk here (counting is already panel-cheap); at ES
    scale the point of random_sampler is skipping doc visits — this
    engine's equivalent lever is the sampled stats pass in
    build.py."""

    def __init__(self, *args, permille: int = 100, salt: str = "rs-agg", **kw):
        super().__init__(*args, **kw)
        if not 1 <= int(permille) <= 1000:
            raise ValueError(
                f"permille must be in [1, 1000], got {permille}"
            )
        self.permille = int(permille)
        self.salt = salt

    def sampled_panel_for_text(self, qtext: str) -> np.ndarray:
        from mini_ivf_ray.pipelines.sampling import split_bucket

        docs = self.disjunctive_matches_for_text(qtext)
        if not docs.size:
            return np.zeros(len(self.facet_labels), dtype=np.int64)
        gate = split_bucket(docs, self.salt) < self.permille
        docs = docs[gate]
        if not docs.size:
            return np.zeros(len(self.facet_labels), dtype=np.int64)
        idx = np.searchsorted(self.facet_ids, docs)
        np.minimum(idx, max(self.facet_ids.size - 1, 0), out=idx)
        valid = (
            self.facet_ids[idx] == docs
            if self.facet_ids.size
            else np.zeros(docs.size, dtype=bool)
        )
        return np.bincount(
            self.facet_codes[idx[valid]], minlength=len(self.facet_labels)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        scale = 1000.0 / self.permille
        qids, facets, counts, ests = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = self.sampled_panel_for_text(qtext)
            for code in np.flatnonzero(c):
                qids.append(qid)
                facets.append(self.facet_labels[code])
                counts.append(int(c[code]))
                ests.append(float(c[code]) * scale)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "facet": pa.array(facets, type=pa.string()),
                "n_sampled": pa.array(counts, type=pa.int64()),
                "n_est": pa.array(ests, type=pa.float64()),
            }
        )


def random_sampler_facets(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    cfg: PipelineConfig | None = None,
    permille: int = 100,
    salt: str = "rs-agg",
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, facet, n_sampled,
    n_est): facet counts over the deterministic permille-gated sample
    of the match set, scaled estimates n_est = n_sampled * 1000/p
    (ES random_sampler).  Deployment identical to faceted_search."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(facet_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(
        np.asarray(facet_values, dtype=object)[order], type=pa.string()
    )
    if vals.null_count:
        raise ValueError(
            f"facet_values contains {vals.null_count} null(s); "
            "map nulls to a sentinel label before faceting"
        )
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    import ray

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    facet_ref = ray.put((ids, codes))
    return queries_ds.map_batches(
        RandomSamplerFacetCounter,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, facet_ref, labels, denied_ref,
        ),
        fn_constructor_kwargs={"permille": permille, "salt": salt},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
