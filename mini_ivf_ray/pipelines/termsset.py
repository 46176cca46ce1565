"""Terms-set query: the Elasticsearch ``terms_set`` query — match
documents containing at least N of the query's distinct terms where N
is a PER-DOCUMENT value read from a numeric field
(``minimum_should_match_field``), ranked by BM25 over the terms each
doc actually matches.

The per-document generalization of minimum_should_match (msm.py): the
canonical use is a tag/skill table where each row stores how many of
its own tags must overlap the query ("match if you cover this row's
required count").  With a CONSTANT field this degenerates to msm
exactly — pytest-pinned bit-identical scores and counts.

Semantics pinned (documented where ES leaves room):
  * the required count is clamped UP to 1 — an index-driven union can
    only surface docs matching >= 1 term, so required <= 0 means
    "any candidate matches" (clamping is observable only in the
    sidecar value echoed back);
  * a candidate doc MISSING the field cannot match (excluded loudly
    rather than silently matching everything);
  * required > the query's indexed-term count is unsatisfiable for
    every doc — those queries return empty without special-casing
    (counts can never reach it);
  * tombstones masked, ties (score desc, doc asc), like every surface.

Serving shape: the msm accumulation (one TAAT union pass; the
distinct-term match count rides the same unique-inverse) plus one
searchsorted gather of the (doc_id, required) sidecar — broadcast
ONCE via ``ray.put``, the decay.py pattern; in doc-sharded serving the
sidecar range-partitions exactly like ShardedIndex.attach_value_sidecar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.msm import _accumulate_with_counts
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact


class TermsSetSearcher(BM25Searcher):
    """Actor-pool stage: (query_id, text) -> top-k (query_id, rank,
    doc_id, n_matched, required, score) under per-doc msm."""

    def __init__(
        self,
        index_dir: str,
        cfg: PipelineConfig | None = None,
        shared_tables: dict | None = None,
        decoded_refs: dict | None = None,
        required_ref=None,
        denied_ref=None,
    ):
        super().__init__(
            index_dir, cfg, shared_tables, decoded_refs, denied_ref=denied_ref
        )
        import ray

        ids, req = (
            ray.get(required_ref)
            if isinstance(required_ref, ray.ObjectRef)
            else required_ref
        )
        self.req_ids = np.asarray(ids, dtype=np.uint64)
        # clamp UP to 1: candidates always match >= 1 term
        self.req = np.maximum(np.asarray(req, dtype=np.int64), 1)
        if self.req_ids.size > 1 and not np.all(
            self.req_ids[:-1] < self.req_ids[1:]
        ):
            raise ValueError(
                "required sidecar must be sorted by unique doc_id"
            )

    def terms_set_topk_for_text(self, qtext: str):
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0
        }
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not wanted:
            return []
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
        uniq, acc, counts, scored = _accumulate_with_counts(blocks)
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        if not uniq.size or not self.req_ids.size:
            return []
        idx = np.searchsorted(self.req_ids, uniq)
        np.minimum(idx, self.req_ids.size - 1, out=idx)
        has_field = self.req_ids[idx] == uniq
        required = np.where(has_field, self.req[idx], np.iinfo(np.int64).max)
        keep = has_field & (counts >= required)
        uniq, acc = uniq[keep], acc[keep]
        counts, required = counts[keep], required[keep]
        if self.denied is not None and self.denied.size and uniq.size:
            from mini_ivf_ray.pipelines.query import _allowed_mask

            live = ~_allowed_mask(uniq, self.denied)
            uniq, acc = uniq[live], acc[live]
            counts, required = counts[live], required[live]
        if not uniq.size:
            return []
        hits = _topk_exact(uniq, acc, self.cfg.topk)
        by_doc = dict(
            zip(uniq.tolist(), zip(counts.tolist(), required.tolist()))
        )
        return [
            (d, int(by_doc[d][0]), int(by_doc[d][1]), s) for d, s in hits
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, nm, req, scores = [], [], [], [], [], []
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for r, (d, c, q, s) in enumerate(
                self.terms_set_topk_for_text(qtext)
            ):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                nm.append(c)
                req.append(q)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(
                    np.array(docs, dtype=np.uint64), type=pa.uint64()
                ),
                "n_matched": pa.array(nm, type=pa.int64()),
                "required": pa.array(req, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def terms_set_search(
    index_dir: str,
    queries_ds,
    required_ids,
    required_counts,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, rank, doc_id, n_matched,
    required, score): docs matching at least their OWN required count
    of the query's distinct terms, BM25-ranked over matched terms.
    The (doc_id, required) sidecar is broadcast ONCE (``ray.put``)."""
    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(required_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    req = np.asarray(required_counts, dtype=np.int64)[order]

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
    required_ref = ray.put((ids, req))
    return queries_ds.map_batches(
        TermsSetSearcher,
        fn_constructor_args=(index_dir, cfg, shared, decoded, required_ref),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
