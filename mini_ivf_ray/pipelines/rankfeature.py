"""Rank-feature query: the Elasticsearch ``rank_feature`` query —
boost documents by a static numeric feature (pagerank, url_length,
freshness ...) through one of ES's three bounded monotone functions,
ADDED to the text score (the standard bool-should composition):

    saturation: contrib = boost * S / (S + pivot)
    log:        contrib = boost * ln(scaling_factor + S)
    sigmoid:    contrib = boost * S^exp / (S^exp + pivot^exp)
    score(q,d) = bm25(q, d) + contrib(d)

Unlike blend.py's raw linear prior, these are ES's shipped shapes:
saturation/sigmoid are bounded in [0, boost) (a runaway feature can
never drown the text score — the property the functions exist for),
log is unbounded but slow.  A matched doc MISSING the feature gets
contribution 0 (ES: the rank_feature clause simply doesn't match).

Features must be NON-NEGATIVE (ES rejects negative rank_features at
index time; enforced here at the driver before broadcast).

Rank safety: an additive positive contribution is rank-unsafe for
text-only MaxScore/WAND bounds, so evaluation runs the FULL exact
TAAT accumulation (the blend/decay rule).  The scale shape is
blend.py's: the (doc_id, feature) sidecar broadcasts once via
``ray.put``; doc-sharded serving holds corpus/R slices
(ShardedIndex.attach_value_sidecar's contract).

Float determinism: per-doc contributions are precomputed ONCE per
actor by a fixed float64 op sequence (validated below and replayed
verbatim by the SQL oracle); the final combine is one add.
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

FUNCTIONS = ("saturation", "log", "sigmoid", "distance")


def feature_contrib(
    values: np.ndarray,
    function: str = "saturation",
    boost: float = 1.0,
    pivot: float = 1.0,
    scaling_factor: float = 1.0,
    exponent: float = 1.0,
    origin: float = 0.0,
) -> np.ndarray:
    """ES rank_feature contribution per feature value; the exact op
    sequence the SQL oracles replay — change both or neither.

    ``function="distance"`` is ES's sibling ``distance_feature`` query
    (numeric/date form): contrib = boost * pivot / (pivot +
    |value - origin|) — bounded in (0, boost], maximal AT the origin,
    halved at distance == pivot.  Unlike the rank_feature shapes the
    field may be ANY float (distance is taken from the origin), so the
    non-negativity gate applies to the other three only."""
    if function not in FUNCTIONS:
        raise ValueError(f"function must be one of {FUNCTIONS}, got {function!r}")
    if boost < 0.0:
        raise ValueError(f"boost must be >= 0, got {boost}")
    v = np.asarray(values, dtype=np.float64)
    if function == "distance":
        if not pivot > 0.0:
            raise ValueError(f"pivot must be > 0, got {pivot}")
        return np.float64(boost) * (
            np.float64(pivot) / (np.float64(pivot) + np.abs(v - np.float64(origin)))
        )
    if v.size and float(np.min(v)) < 0.0:
        raise ValueError("rank_feature values must be non-negative")
    if function == "saturation":
        if not pivot > 0.0:
            raise ValueError(f"pivot must be > 0, got {pivot}")
        return np.float64(boost) * (v / (v + np.float64(pivot)))
    if function == "log":
        if not scaling_factor >= 1.0:
            raise ValueError(
                f"scaling_factor must be >= 1, got {scaling_factor}"
            )
        return np.float64(boost) * np.log(np.float64(scaling_factor) + v)
    if not pivot > 0.0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    if not exponent > 0.0:
        raise ValueError(f"exponent must be > 0, got {exponent}")
    ve = v ** np.float64(exponent)
    return np.float64(boost) * (ve / (ve + np.float64(pivot) ** np.float64(exponent)))


class RankFeatureSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> top-k by
    bm25 + rank_feature contribution.  Contributions precomputed once
    per actor."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        values_ref=None,
        function: str = "saturation",
        boost: float = 1.0,
        pivot: float = 1.0,
        scaling_factor: float = 1.0,
        exponent: float = 1.0,
        origin: float = 0.0,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, vals = (
            ray.get(values_ref)
            if isinstance(values_ref, ray.ObjectRef)
            else values_ref
        )
        self.feat_ids = np.asarray(ids, dtype=np.uint64)
        self.contrib = feature_contrib(
            np.asarray(vals, dtype=np.float64),
            function, boost, pivot, scaling_factor, exponent, origin,
        )
        if self.feat_ids.size > 1 and not np.all(
            self.feat_ids[:-1] < self.feat_ids[1:]
        ):
            raise ValueError("feature sidecar must be sorted by unique doc_id")

    def boosted_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
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
        if self.feat_ids.size:
            idx = np.searchsorted(self.feat_ids, docs)
            np.minimum(idx, self.feat_ids.size - 1, out=idx)
            hit = self.feat_ids[idx] == docs
            # missing feature -> the clause doesn't match: contrib 0
            scores = scores + np.where(hit, self.contrib[idx], 0.0)
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
            for r, (d, s) in enumerate(self.boosted_topk_for_text(qtext)):
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


def rank_feature_search(
    index_dir: str,
    queries_ds,
    feature_ids,
    features,
    cfg: PipelineConfig | None = None,
    function: str = "saturation",
    boost: float = 1.0,
    pivot: float = 1.0,
    scaling_factor: float = 1.0,
    exponent: float = 1.0,
    origin: float = 0.0,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    with score = bm25 + ES rank_feature contribution over a
    non-negative static feature.  The (doc_id, feature) sidecar is
    broadcast ONCE (``ray.put``)."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(feature_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = np.asarray(features, dtype=np.float64)[order]
    # validate params + values driver-side before spawning actors
    feature_contrib(vals, function, boost, pivot, scaling_factor, exponent, origin)

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
    values_ref = ray.put((ids, vals))
    return queries_ds.map_batches(
        RankFeatureSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={
            "function": function,
            "boost": boost,
            "pivot": pivot,
            "scaling_factor": scaling_factor,
            "origin": origin,
            "exponent": exponent,
            "denied_ref": denied_ref,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
