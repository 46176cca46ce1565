"""Function-score decay retrieval: Elasticsearch ``function_score``
decay functions (gauss / exp / linear) over a numeric per-document
field, multiplied into the BM25 text score.

The canonical "prefer documents near an origin" ranking — recency
boosts (ts near now), geo pivots, or length preferences — as ES ships
it.  For a field value ``v``:

    d     = max(0, |v - origin| - offset)          (offset-flattened
                                                    distance from origin)
    gauss : mult = exp(ln(decay) * (d/scale)^2)    (== exp(-d^2/2sigma^2),
                                                    sigma^2 = -scale^2/(2 ln decay))
    exp   : mult = exp(ln(decay) * (d/scale))
    linear: mult = max(0, 1 - d * (1-decay) / scale)
    score = bm25(q, d) * mult

so ``mult == decay`` exactly at ``d == scale``, and ``mult == 1``
inside the offset plateau (d == 0 gives exp(0) / 1 - 0, exactly 1.0 —
a query whose matches all sit in the plateau scores bit-identically
to plain BM25).  A matched document MISSING from the value sidecar
multiplies by 1.0, ES's documented missing-field behavior for decay
functions.  Linear can floor a match to 0.0; the document still
matches (ES semantics) and ranks by (score desc, doc_id asc) like
every other result row.

Scale shape: the (doc_id, value) sidecar is the same column-slim
O(corpus) broadcast as blend.py's static prior — ``ray.put`` once
here; in doc-sharded serving each shard holds its corpus/R slice
exactly like ``ShardedIndex.attach_sidecar``.  A multiplicative
factor <= 1 changes ranking, so text-only MaxScore/WAND bounds are
rank-unsafe: evaluation runs the FULL exact TAAT accumulation (the
blend.py rule); the index-local scale path is the same documented
bound augmentation (bake the block's max multiplier into stored
maxima at encode time).

Float determinism: d, r = d/scale, and each mode's multiplier are the
identical IEEE float64 op sequence the SQL oracle runs
(greatest/abs/exp/ln are libm on both sides), and the final combine
is one multiply — scores hash-match under the driver's rounding.
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

MODES = ("gauss", "exp", "linear")


def decay_multiplier(
    values: np.ndarray,
    mode: str = "gauss",
    origin: float = 0.0,
    scale: float = 1.0,
    offset: float = 0.0,
    decay: float = 0.5,
) -> np.ndarray:
    """ES decay multiplier per value; float64 in, float64 out.  The
    exact op sequence here is replayed by the SQL oracles — change
    both or neither."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    if not scale > 0.0:
        raise ValueError(f"scale must be > 0, got {scale}")
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    if offset < 0.0:
        raise ValueError(f"offset must be >= 0, got {offset}")
    v = np.asarray(values, dtype=np.float64)
    d = np.maximum(0.0, np.abs(v - np.float64(origin)) - np.float64(offset))
    r = d / np.float64(scale)
    if mode == "gauss":
        return np.exp(np.log(np.float64(decay)) * r * r)
    if mode == "exp":
        return np.exp(np.log(np.float64(decay)) * r)
    return np.maximum(0.0, 1.0 - d * (1.0 - np.float64(decay)) / np.float64(scale))


class DecaySearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> top-k by
    bm25 * decay(field).  Sidecar resolved once per actor."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        values_ref=None,
        mode: str = "gauss",
        origin: float = 0.0,
        scale: float = 1.0,
        offset: float = 0.0,
        decay: float = 0.5,
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
        self.value_ids = np.asarray(ids, dtype=np.uint64)
        if not np.all(self.value_ids[:-1] < self.value_ids[1:]):
            raise ValueError("value sidecar must be sorted by unique doc_id")
        # multipliers precomputed ONCE per actor (validates params too)
        self.value_mult = decay_multiplier(
            np.asarray(vals, dtype=np.float64), mode, origin, scale, offset, decay
        )

    def decayed_topk_for_text(self, qtext: str) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        fetched = self.reader.fetch_terms(wanted)
        pp = self.counters.setdefault("partition_probes", {})
        for t, locs in wanted.items():
            for p in dict.fromkeys(locs):
                pp[p] = pp.get(p, 0) + 1
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
        if self.value_ids.size:
            idx = np.searchsorted(self.value_ids, docs)
            np.minimum(idx, self.value_ids.size - 1, out=idx)
            hit = self.value_ids[idx] == docs
            # missing field -> multiplier 1.0 (ES decay semantics)
            mult = np.where(hit, self.value_mult[idx], 1.0)
        else:
            mult = np.ones(docs.size, dtype=np.float64)
        decayed = scores * mult
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        return _topk_exact(docs, decayed, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, s) in enumerate(self.decayed_topk_for_text(qtext)):
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


def decay_search(
    index_dir: str,
    queries_ds,
    value_ids,
    values,
    cfg: PipelineConfig | None = None,
    mode: str = "gauss",
    origin: float = 0.0,
    scale: float = 1.0,
    offset: float = 0.0,
    decay: float = 0.5,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, score)
    with score = bm25 * decay_multiplier(field value).  The
    (doc_id, value) sidecar is broadcast ONCE (``ray.put``);
    tombstones masked like query.search."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    # validate params driver-side too (fail before spawning actors)
    decay_multiplier(np.zeros(1), mode, origin, scale, offset, decay)
    ids = np.asarray(value_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = np.asarray(values, dtype=np.float64)[order]

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
        DecaySearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, values_ref),
        fn_constructor_kwargs={
            "mode": mode,
            "origin": origin,
            "scale": scale,
            "offset": offset,
            "decay": decay,
            "denied_ref": denied_ref,
        },
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
