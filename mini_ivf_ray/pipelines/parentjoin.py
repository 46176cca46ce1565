"""Parent-child join retrieval: Elasticsearch's ``join`` field and its
two queries — ``has_child`` and ``has_parent`` (Lucene's
ToParentBlockJoinQuery / ToChildBlockJoinQuery family, flattened to a
two-table relation instead of block-indexed segments).

Relation.  The testdata ``events`` table carries no parent key, so the
parent of event e is the document at position
``h60(event_id, "hc-parent") % N`` in doc-id order — the synth_edges
convention (graph.py): deterministic, engine == any-SQL-engine via the
md5-substr UBIGINT form.  At real scale the parent key is a real
column and ``child_parent_map`` degenerates to a projection; the
id-order lookup table is a synthesis-only scaffold broadcast once.

has_child (ES ``has_child`` inside a bool ``must``):
  a parent ranks iff it matches the TEXT query AND at least
  ``min_children`` of its children pass the child filter; its score is
  ``bm25(q, parent) + score_mode(child scores)``.  Child score = the
  child's numeric ``value`` field (standing in for child-query
  relevance, ES's function_score-on-child shape) carried as INTEGER
  CENTS (``round(value * 100)``) so sum/avg are order-independent
  integer math — bit-identical across partitionings and replayable in
  SQL (the pagerank fixed-point argument).  score_mode in
  {"none", "sum", "max", "min", "avg"} — ES's five.  The child
  aggregate is query-INDEPENDENT, so it reduces to a per-parent
  (qualifies, contrib) sidecar: the searcher drops non-qualifying
  matches (must semantics — unlike rank_feature's keep-with-0) and
  adds contrib.  Additive positive contribution is rank-unsafe for
  text-only bounds -> full exact TAAT (the rank_feature/decay rule).

  Scale shape: ONE streamed pass over children (filter -> parent
  assign -> per-block partial groupby) + ONE combiner-first groupby
  merge; the slim (parent, n, cents) aggregate is matched-parent-
  proportional, broadcast once via ``ray.put``; doc-sharded serving
  holds corpus/R range slices (ShardedIndex.rerank_search mode
  "has_child" over attach_value_sidecar — qualifying parents only, so
  the slice is also qualification-filtered).

has_parent (ES ``has_parent`` with score=true):
  every child of a text-matching parent, ranked by the PARENT's BM25
  score (ES propagates the parent score to each child), ties broken
  (score desc, event_id asc).  Three streamed stages, nothing
  corpus-sized on the driver: (1) the child->parent map is a stateless
  projection Dataset; (2) the parents' FULL scored match sets are
  emitted as a Dataset by a query-actor pool (match-set-proportional
  rows, dynamically block-split by Ray); (3) one bucketed hash join on
  doc_id (relational.bucketed_hash_join) + per-block partial top-k,
  driver merges (blocks x queries x k) slim rows.

Reference analog: the gt hash semi-join of the recall harness
(mini-ivf utils.cpp get_gt / recall join) — a relation between two id
spaces resolved by hash join, re-expressed as Dataset exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    _allowed_mask,
    _taat_accumulate,
    _topk_exact,
)
from mini_ivf_ray.pipelines.sampling import salt_hash60

SCORE_MODES = ("none", "sum", "max", "min", "avg")
PARENT_SALT = "hc-parent"


def _parent_lut(docs_ds):
    """Sorted doc-id lookup (pos -> doc_id): the synthesis-only
    scaffold shared with graph.synth_edges."""
    # uint64 space throughout: hashed doc ids exceed 2**63 and must
    # never be ordered or stored through an int64 intermediate
    ids = np.sort(
        docs_ds.select_columns(["doc_id"])
        .to_pandas()["doc_id"]
        .to_numpy()
        .astype(np.uint64)
    )
    if not ids.size:
        raise ValueError("documents dataset is empty")
    return ids


def child_parent_map(children_ds, docs_ds, salt: str = PARENT_SALT):
    """(event_id, ...) -> (event_id, parent_doc, ...): the synthetic
    parent assignment as a stateless streamed projection.  At real
    scale the parent key is a column and this is a rename."""
    import ray

    lut = _parent_lut(docs_ds)
    n = lut.size
    lut_ref = ray.put(lut)

    def assign(batch: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        ev = batch["event_id"].to_numpy().astype(np.int64)
        pos = salt_hash60(ev, salt) % n
        return batch.append_column(
            "parent_doc", pa.array(table[pos], type=pa.uint64())
        )

    return children_ds.map_batches(assign, batch_format="pyarrow")


def has_child_aggregate(
    children_ds,
    docs_ds,
    child_type: str | None = None,
    value_col: str = "value",
    salt: str = PARENT_SALT,
):
    """Per-parent child aggregate: (parent_doc, n_children, cents_sum,
    cents_min, cents_max) — ONE streamed pass with per-block partial
    groupbys, then ONE combiner-first groupby merge.  Child scores are
    integer cents so every downstream combine is order-independent."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Max, Min, Sum

    lut = _parent_lut(docs_ds)
    n = lut.size
    lut_ref = ray.put(lut)

    def partial(batch: pa.Table) -> pa.Table:
        if child_type is not None:
            batch = batch.filter(pc.equal(batch["event_type"], child_type))
        if not batch.num_rows:
            return pa.table(
                {
                    "parent_key": pa.array([], type=pa.int64()),
                    "pn": pa.array([], type=pa.int64()),
                    "ps": pa.array([], type=pa.int64()),
                    "pmin": pa.array([], type=pa.int64()),
                    "pmax": pa.array([], type=pa.int64()),
                }
            )
        table = ray.get(lut_ref)
        ev = batch["event_id"].to_numpy().astype(np.int64)
        parent = table[salt_hash60(ev, salt) % n]
        cents = np.round(
            batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        order = np.argsort(parent, kind="stable")
        parent, cents = parent[order], cents[order]
        uniq, starts = np.unique(parent, return_index=True)
        cnt = np.diff(np.append(starts, parent.size))
        sums = np.add.reduceat(cents, starts)
        mins = np.minimum.reduceat(cents, starts)
        maxs = np.maximum.reduceat(cents, starts)
        # groupby key travels as the int64 BIT-VIEW of the uint64 doc
        # id (the sink.py/olap.py convention): equality-preserving, and
        # never overflows Ray's internal pandas conversion
        return pa.table(
            {
                "parent_key": pa.array(uniq.view(np.int64), type=pa.int64()),
                "pn": pa.array(cnt.astype(np.int64), type=pa.int64()),
                "ps": pa.array(sums, type=pa.int64()),
                "pmin": pa.array(mins, type=pa.int64()),
                "pmax": pa.array(maxs, type=pa.int64()),
            }
        )

    partials = children_ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby("parent_key").aggregate(
        Sum("pn", alias_name="n_children"),
        Sum("ps", alias_name="cents_sum"),
        Min("pmin", alias_name="cents_min"),
        Max("pmax", alias_name="cents_max"),
    )

    def unview(b: pa.Table) -> pa.Table:
        key = b["parent_key"].to_numpy().astype(np.int64).view(np.uint64)
        return pa.table(
            {
                "parent_doc": pa.array(key, type=pa.uint64()),
                "n_children": b["n_children"],
                "cents_sum": b["cents_sum"],
                "cents_min": b["cents_min"],
                "cents_max": b["cents_max"],
            }
        )

    return merged.map_batches(unview, batch_format="pyarrow")


def has_child_contrib(
    agg_df,
    score_mode: str = "sum",
    min_children: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """(qualifying parent ids sorted, float64 contrib) from the child
    aggregate.  The float64 op order (cents -> /100.0 -> [/n]) is the
    contract the SQL oracles replay verbatim."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}")
    if min_children < 1:
        raise ValueError(f"min_children must be >= 1, got {min_children}")
    if not len(agg_df):
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
    ids = agg_df["parent_doc"].to_numpy().astype(np.uint64)
    n = agg_df["n_children"].to_numpy().astype(np.int64)
    keep = n >= min_children
    ids, n = ids[keep], n[keep]
    if score_mode == "none":
        contrib = np.zeros(ids.size, dtype=np.float64)
    elif score_mode == "sum":
        contrib = agg_df["cents_sum"].to_numpy()[keep].astype(np.float64) / 100.0
    elif score_mode == "max":
        contrib = agg_df["cents_max"].to_numpy()[keep].astype(np.float64) / 100.0
    elif score_mode == "min":
        contrib = agg_df["cents_min"].to_numpy()[keep].astype(np.float64) / 100.0
    else:  # avg
        contrib = (
            agg_df["cents_sum"].to_numpy()[keep].astype(np.float64) / 100.0
        ) / n.astype(np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], contrib[order]


class HasChildSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> top-k parents by
    bm25 + has_child contribution.  MUST semantics: a text match
    without a qualifying child row is DROPPED (unlike rank_feature's
    contribute-0)."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        sidecar_ref=None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, contrib = (
            ray.get(sidecar_ref)
            if isinstance(sidecar_ref, ray.ObjectRef)
            else sidecar_ref
        )
        self.child_ids = np.asarray(ids, dtype=np.uint64)
        self.child_contrib = np.asarray(contrib, dtype=np.float64)
        if self.child_ids.size > 1 and not np.all(
            self.child_ids[:-1] < self.child_ids[1:]
        ):
            raise ValueError("has_child sidecar must be sorted by unique doc_id")

    def child_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        if not self.child_ids.size:
            return []
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
            from mini_ivf_ray.functions import bm25

            b.set_scoring(
                bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                self.stats.avgdl,
                self.cfg.k1,
                self.cfg.b,
            )
            blocks.append(b)
        if not blocks:
            return []
        docs, scores, scored = _taat_accumulate(blocks)
        if self.denied is not None and self.denied.size:
            keep = ~_allowed_mask(docs, self.denied)
            docs, scores = docs[keep], scores[keep]
        if not docs.size:
            return []
        # MUST: only parents with a qualifying child aggregate survive
        idx = np.searchsorted(self.child_ids, docs)
        np.minimum(idx, self.child_ids.size - 1, out=idx)
        hit = self.child_ids[idx] == docs
        docs, scores, idx = docs[hit], scores[hit], idx[hit]
        if not docs.size:
            return []
        scores = scores + self.child_contrib[idx]
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return _topk_exact(docs, scores, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.child_topk_for_text(qtext)):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def has_child_search(
    index_dir: str,
    queries_ds,
    children_ds,
    docs_ds,
    cfg: PipelineConfig | None = None,
    child_type: str | None = None,
    score_mode: str = "sum",
    min_children: int = 1,
    value_col: str = "value",
    salt: str = PARENT_SALT,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    with score = bm25 + score_mode(child scores), parents filtered to
    >= min_children matching children (ES has_child in a bool must)."""
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    agg = has_child_aggregate(
        children_ds, docs_ds, child_type=child_type, value_col=value_col, salt=salt
    ).to_pandas()
    ids, contrib = has_child_contrib(agg, score_mode, min_children)

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    sidecar_ref = ray.put((ids, contrib))
    return queries_ds.map_batches(
        HasChildSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, sidecar_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )


class _MatchEmitter(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> the FULL scored match set
    (query_id, doc_id, score) — the has_parent join's parent side.
    Output is match-set-proportional, so ``__call__`` is a GENERATOR
    yielding bounded chunks: a 100-TB query's match set streams
    through the object store instead of assembling in one actor heap
    (Ray treats each yielded table as its own output block)."""

    CHUNK = 65536

    def __call__(self, batch: pa.Table):
        emitted = False
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
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
                from mini_ivf_ray.functions import bm25

                b.set_scoring(
                    bm25.idf(self.stats.df[b.term], self.stats.n_docs),
                    self.stats.avgdl,
                    self.cfg.k1,
                    self.cfg.b,
                )
                blocks.append(b)
            if not blocks:
                continue
            d, s, _ = _taat_accumulate(blocks)
            if self.denied is not None and self.denied.size:
                keep = ~_allowed_mask(d, self.denied)
                d, s = d[keep], s[keep]
            for i in range(0, d.size, self.CHUNK):
                dj = d[i : i + self.CHUNK]
                sj = s[i : i + self.CHUNK]
                emitted = True
                yield pa.table(
                    {
                        "query_id": pa.array(
                            np.full(dj.size, qid, dtype=np.int64),
                            type=pa.int64(),
                        ),
                        "doc_id": pa.array(
                            dj.astype(np.uint64), type=pa.uint64()
                        ),
                        "score": pa.array(sj, type=pa.float64()),
                    }
                )
        if not emitted:
            yield pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.uint64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )


def has_parent_search(
    index_dir: str,
    queries_ds,
    children_ds,
    docs_ds,
    cfg: PipelineConfig | None = None,
    topk: int = 20,
    salt: str = PARENT_SALT,
    num_buckets: int | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, event_id, score):
    top-k CHILDREN ranked by their parent's BM25 score (ES has_parent
    score=true), ties (score desc, event_id asc).  One bucketed hash
    join + per-block partial top-k; driver merges slim candidates."""
    import pandas as pd
    import ray

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)

    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    pscores = queries_ds.map_batches(
        _MatchEmitter,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
    cmap = child_parent_map(
        children_ds.select_columns(["event_id"]), docs_ds, salt=salt
    ).map_batches(
        lambda b: b.rename_columns(["event_id", "doc_id"]),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(cmap, pscores, on="doc_id", num_buckets=num_buckets)

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(["query_id", "event_id", "score"]).to_pandas()
        df = df.sort_values(
            ["query_id", "score", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("query_id", sort=False).head(topk)
        return pa.table(
            {
                "query_id": pa.array(df["query_id"].to_numpy(), type=pa.int64()),
                "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
                "score": pa.array(df["score"].to_numpy(), type=pa.float64()),
            }
        )

    cand = joined.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "event_id": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
    cand = cand.sort_values(
        ["query_id", "score", "event_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    cand = cand.groupby("query_id", sort=False).head(topk).reset_index(drop=True)
    cand["rank"] = cand.groupby("query_id", sort=False).cumcount()
    return cand[["query_id", "rank", "event_id", "score"]]


def children_terms_agg(
    index_dir: str,
    queries_ds,
    children_ds,
    docs_ds,
    cfg: PipelineConfig | None = None,
    label_col: str = "event_type",
    value_col: str = "value",
    salt: str = PARENT_SALT,
    num_buckets: int | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """ES ``children`` aggregation with a terms + metric sub-agg: per
    query, switch from the TEXT-matched parents to their CHILDREN and
    bucket those by ``label_col`` -> (query_id, label, n_children,
    cents_sum), labels ascending per query.

    The inverse direction of has_child (parents scored by a child
    aggregate): here the match set selects parents, and the numbers
    come from the child side.  Child values travel as INTEGER CENTS
    (``round(value * 100)`` — has_child's rule), so every partial sum
    is order-independent and the merge is exact.

    Scale shape (the has_parent plan with an aggregate tail): the
    parents' full match sets stream from the _MatchEmitter actor pool
    (match-set-proportional, chunked); the child->parent map is a
    stateless projection; ONE bucketed hash join on doc_id aligns
    them; per-block partial groupbys reduce to (queries x labels)
    slim rows which the driver merges — the child table itself never
    materializes anywhere.  A matched parent with zero children
    simply contributes no rows (ES: empty buckets are absent)."""
    import pandas as pd
    import ray

    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = decoded = None
    if share == "decoded":
        from mini_ivf_ray.sources.decoded import share_decoded_index

        decoded = share_decoded_index(index_dir, cfg)
    elif share:
        from mini_ivf_ray.pipelines.query import share_segments

        shared = share_segments(index_dir, cfg.num_partitions)
    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    matches = queries_ds.map_batches(
        _MatchEmitter,
        fn_constructor_args=(index_dir, cfg, shared, decoded),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    ).select_columns(["query_id", "doc_id"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "label": batch[label_col],
                "cents": pa.array(cents, type=pa.int64()),
            }
        )

    cmap = child_parent_map(
        children_ds.select_columns(["event_id", label_col, value_col])
        .map_batches(to_cents, batch_format="pyarrow"),
        docs_ds,
        salt=salt,
    ).map_batches(
        lambda b: b.rename_columns(["event_id", "label", "cents", "doc_id"]),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        cmap, matches, on="doc_id", num_buckets=num_buckets
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["query_id", "label", "cents"]).to_pandas()
        g = (
            df.groupby(["query_id", "label"], as_index=False)
            .agg(pn=("cents", "size"), ps=("cents", "sum"))
        )
        return pa.table(
            {
                "query_id": pa.array(
                    g["query_id"].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "label": pa.array(g["label"].tolist(), type=pa.string()),
                "pn": pa.array(
                    g["pn"].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "ps": pa.array(
                    g["ps"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "label": pd.Series([], dtype=object),
                "n_children": pd.Series([], dtype=np.int64),
                "cents_sum": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        parts.groupby(["query_id", "label"], as_index=False)
        .agg(n_children=("pn", "sum"), cents_sum=("ps", "sum"))
        .sort_values(["query_id", "label"], kind="mergesort")
        .reset_index(drop=True)
    )
    for c in ("query_id", "n_children", "cents_sum"):
        out[c] = out[c].astype(np.int64)
    return out


def parent_terms_agg(
    children_ds,
    docs_ds,
    attr_ids,
    attr_labels,
    child_type: str | None = None,
    salt: str = PARENT_SALT,
):
    """ES ``parent`` aggregation (the inverse of children_terms_agg):
    bucket the DISTINCT PARENTS of the filtered children by a parent
    attribute -> (label, n_parents), labels ascending.

    Distributed shape, child-table-streaming end to end: (1) one
    stateless pass filters children and projects each to its parent
    key (int64 bit-view, the has_child convention), deduplicating
    per block; (2) ONE combiner-first ``groupby(parent_key).count()``
    exchange yields the exact distinct-parent set (matched-parents-
    sized, never child-proportional past the exchange); (3) a second
    streamed pass gathers each parent's attribute code from the
    broadcast-once sorted sidecar and emits per-block partial counts;
    the driver merges a label-cardinality panel.  A parent with
    children in several blocks is counted ONCE (the groupby dedups);
    a child whose h60 parent fell on a tombstoned/unknown id would
    surface as a sidecar miss and is dropped loudly via the valid
    mask."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    ids = np.asarray(attr_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(
        np.asarray(attr_labels, dtype=object)[order], type=pa.string()
    )
    if vals.null_count:
        raise ValueError("attr_labels contains nulls; map to a sentinel")
    enc = pa.compute.dictionary_encode(vals)
    labels = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    lut = _parent_lut(docs_ds)
    n = lut.size
    bundle_ref = ray.put((lut, ids, codes))

    def to_parent(batch: pa.Table) -> pa.Table:
        if child_type is not None:
            batch = batch.filter(pc.equal(batch["event_type"], child_type))
        if not batch.num_rows:
            return pa.table({"parent_key": pa.array([], type=pa.int64())})
        table, _ids, _codes = ray.get(bundle_ref)
        ev = batch["event_id"].to_numpy().astype(np.int64)
        parent = table[salt_hash60(ev, salt) % n]
        return pa.table(
            {
                "parent_key": pa.array(
                    np.unique(parent).view(np.int64), type=pa.int64()
                )
            }
        )

    distinct = (
        children_ds.map_batches(to_parent, batch_format="pyarrow")
        .groupby("parent_key")
        .count()
    )

    def partial(batch: pa.Table) -> pa.Table:
        _table, s_ids, s_codes = ray.get(bundle_ref)
        keys = batch["parent_key"].to_numpy().astype(np.int64).view(np.uint64)
        idx = np.searchsorted(s_ids, keys)
        np.minimum(idx, s_ids.size - 1, out=idx)
        valid = s_ids[idx] == keys
        c = np.bincount(s_codes[idx[valid]], minlength=len(labels))
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "code": pa.array(nz.astype(np.int64), type=pa.int64()),
                "pn": pa.array(c[nz].astype(np.int64), type=pa.int64()),
            }
        )

    parts = distinct.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_rows = []
    if len(parts):
        g = parts.groupby("code", as_index=False)["pn"].sum()
        for code, pn in zip(g["code"], g["pn"]):
            out_rows.append((labels[int(code)], int(pn)))
    out = pd.DataFrame(out_rows, columns=["label", "n_parents"])
    out = out.sort_values("label", kind="mergesort").reset_index(drop=True)
    if len(out):
        out["n_parents"] = out["n_parents"].astype(np.int64)
    return out
