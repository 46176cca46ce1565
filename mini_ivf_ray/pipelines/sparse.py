"""Sparse-vector (weighted-term) retrieval: Elasticsearch's
``sparse_vector`` / ``text_expansion`` query (the ELSER / SPLADE-style
learned-sparse primitive; Lucene impact-style dot-product scoring).

The query is a map ``term -> weight`` (the "sparse vector"); the score
is the dot product with the document's stored impacts:

    score(q, d) = sum over t in q with tf(t, d) > 0 of  w_q(t) * w_d(t)

ES stores model-produced doc-side weights at index time; this engine's
stored per-posting impact is the term frequency, so ``w_d(t) := tf``
(documented identification — the same raw payload the pluggable
similarities read; a learned-impact index would store its weights in
the tf slot and nothing else changes).  No idf, no length
normalization: the dot product IS the model, exactly ES's scoring for
``sparse_vector`` (each matched token contributes
``query_weight * doc_weight``).

Weights must be > 0 (ES models emit positive activations; a zero or
negative weight is a caller bug and raises — the boost.py contract).
Positive contributions give the usual guarantees for free:

  * a doc matching any weighted term scores > 0 (OR semantics);
  * doc-sharded serving reuses search()'s max-dedup merge — a
    boundary shard's partial dot product is <= the home shard's full
    one, so ``ShardedIndex.similarity_search(model="sparse")`` is
    bit-identical to the single-index path (pytest-pinned).

Serving shape: identical deployment to lm_dirichlet.py — an
actor-pool searcher over RAW payload-mode postings (tf is needed;
baked BM25 contributions cannot be inverted).  Work per query is
postings-proportional (only the weighted terms' lists are fetched,
partition-selectively).

Reference analog: ADist lookup-join scoring (mini-ivf
index_ivfpq.cpp:111-117 gather-sum of per-code distance
contributions) — a per-posting table lookup accumulated per doc; here
the lookup table is the query's weight map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact
from mini_ivf_ray.pipelines.synonyms import _raw_postings


def validate_weights(weights: dict[str, float]) -> dict[str, float]:
    """Normalize a query weight map: tokenize each key (a multi-token
    key is a caller bug), require weight > 0."""
    out: dict[str, float] = {}
    for term, w in weights.items():
        toks = tokenize(term)
        if len(toks) != 1:
            raise ValueError(
                f"sparse_vector term {term!r} does not tokenize to one"
                f" token (got {toks!r})"
            )
        w = float(w)
        if not w > 0.0:
            raise ValueError(
                f"sparse_vector weight for {term!r} must be > 0, got {w}"
            )
        out[toks[0]] = out.get(toks[0], 0.0) + w
    return out


class SparseVectorSearcher(BM25Searcher):
    """Actor-pool stage: one row per query with parallel list columns
    ``terms`` / ``weights`` -> top-k (query_id, rank, doc_id, score)."""

    def sparse_topk_for_weights(
        self, weights: dict[str, float]
    ) -> list[tuple[int, float]]:
        terms = sorted(weights)
        wanted = {
            t: self.stats.term_locations(t, self.cfg)
            for t in terms
            if self.stats.df.get(t, 0) > 0  # OOV -> empty posting list
        }
        fetched = self.reader.fetch_terms(wanted)
        per_term: list[tuple[np.ndarray, np.ndarray]] = []
        scored = 0
        for t in sorted(wanted):
            b = fetched.get(t)
            if b is None or not b.n_blocks:
                continue
            docs, tfs, _dls = _raw_postings(b)
            if not docs.size:
                continue
            scored += docs.size
            per_term.append((docs, np.float64(weights[t]) * tfs))
        self.counters["searched_cnt"] = (
            self.counters.get("searched_cnt", 0) + scored
        )
        self.counters["n_queries"] = self.counters.get("n_queries", 0) + 1
        if not per_term:
            return []
        docs_cat = np.concatenate([d for d, _ in per_term])
        con_cat = np.concatenate([c for _, c in per_term])
        uniq, inv = np.unique(docs_cat, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, con_cat)
        if self.denied is not None and self.denied.size and uniq.size:
            from mini_ivf_ray.pipelines.query import _allowed_mask

            live = ~_allowed_mask(uniq, self.denied)
            uniq, scores = uniq[live], scores[live]
        if not uniq.size:
            return []
        return _topk_exact(uniq, scores, self.cfg.topk)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, terms, ws in zip(
            batch["query_id"].to_pylist(),
            batch["terms"].to_pylist(),
            batch["weights"].to_pylist(),
        ):
            weights = validate_weights(dict(zip(terms, ws)))
            for r, (d, s) in enumerate(self.sparse_topk_for_weights(weights)):
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


def sparse_vector_search(
    index_dir: str,
    queries_ds,
    cfg: PipelineConfig | None = None,
    share: bool = True,
    respect_deletes: bool = True,
):
    """queries (query_id, terms list<string>, weights list<double>) ->
    (query_id, rank, doc_id, score) under sparse-vector dot-product
    scoring — same deployment as query.search()."""
    from mini_ivf_ray.pipelines.query import share_segments
    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    shared = share_segments(index_dir, cfg.num_partitions) if share else None
    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None

    return queries_ds.map_batches(
        SparseVectorSearcher,
        fn_constructor_args=(index_dir, cfg, shared, None),
        fn_constructor_kwargs={"denied_ref": denied_ref},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
