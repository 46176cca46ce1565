"""Rare-terms and multi-terms aggregations: Elasticsearch
``rare_terms`` and ``multi_terms`` over the match set.

Both are REDUCE-phase cuts over the exact facet panel that
facets.faceted_search / serving.ShardedIndex.facet_search already
produce — (query_id, label, n_docs) rows, queries x panel-cardinality,
never doc-proportional.  The distributed part (the counting) is the
proven facet machinery; the part added here is the corpus-independent
bucket rule, kept in ONE kernel each (:func:`rare_cut`,
:func:`multi_cut`) that the single-index path, the doc-sharded path,
and the SQL oracle all replay — the pipelineagg.py convention.

``rare_terms``: buckets whose GLOBAL match count is <= max_doc_count
(the "long tail" panel — ES ships it because plain ``terms`` ordered
ascending is unstable under shard pruning).  The load-bearing
semantics: rarity is a global property, so the filter runs AFTER the
shard merge — a shard-local count says nothing about the global one.
One documented divergence: ES's own rare_terms is APPROXIMATE (a
CuckooFilter prunes candidate buckets with a configured false-positive
rate); this analog is exact, which is affordable precisely because the
facet panel is panel-sized and fully merged before the cut.

``multi_terms``: top-``num_buckets`` COMPOSITE-key buckets — (key_a,
key_b) pairs — by (count desc, key_a asc, key_b asc), ES's
deterministic composite-terms ordering.  The composite label is the
pair joined by an unprintable separator (validated absent from the
inputs, loudly) so the counting path is byte-for-byte the facet
machinery; keys are split back only at the cut.  Same divergence as
rare_terms, inverted: ES multi_terms prunes shard-locally
(``shard_size``) and can return wrong buckets under skew; here every
bucket survives to the global cut, so the result is exact and
SQL-replayable.

Reference analogy: QueryObs' per-cluster histogram
(index_ivfpq.cpp:412-470) with a tail-filter / a composite key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig

SEP = "\x1f"  # unit separator: joins composite keys inside the panel

RARE_COLUMNS = ["query_id", "facet", "n_docs"]
MULTI_COLUMNS = ["query_id", "key_a", "key_b", "n_docs"]


def rare_cut(panel: pd.DataFrame, max_doc_count: int) -> pd.DataFrame:
    """The ONE rare-terms rule: keep buckets with 0 < n_docs <=
    max_doc_count, ordered (query_id, facet) — applied only to a
    fully-merged (global) panel."""
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    if not len(panel):
        return pd.DataFrame(columns=RARE_COLUMNS)
    out = panel[panel["n_docs"] <= max_doc_count]
    return (
        out.sort_values(["query_id", "facet"], kind="mergesort")
        .reset_index(drop=True)[RARE_COLUMNS]
    )


def multi_cut(panel: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    """The ONE multi-terms rule: split the composite label on SEP and
    keep each query's top ``num_buckets`` buckets by (n_docs desc,
    key_a asc, key_b asc) — applied only to a fully-merged panel."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if not len(panel):
        return pd.DataFrame(columns=MULTI_COLUMNS)
    split = panel["facet"].str.split(SEP, n=1, expand=True)
    df = pd.DataFrame(
        {
            "query_id": panel["query_id"].to_numpy(),
            "key_a": split[0].to_numpy(),
            "key_b": split[1].to_numpy(),
            "n_docs": panel["n_docs"].to_numpy(),
        }
    )
    df = df.sort_values(
        ["query_id", "n_docs", "key_a", "key_b"],
        ascending=[True, False, True, True],
        kind="mergesort",
    )
    df["_rank"] = df.groupby("query_id").cumcount()
    out = df[df["_rank"] < num_buckets].drop(columns="_rank")
    return out.reset_index(drop=True)


def _composite_labels(values_a, values_b) -> np.ndarray:
    a = np.asarray(values_a, dtype=object)
    b = np.asarray(values_b, dtype=object)
    if a.size != b.size:
        raise ValueError(f"key arrays disagree: {a.size} vs {b.size}")
    for name, arr in (("a", a), ("b", b)):
        bad = sum(1 for v in arr if v is None or SEP in v)
        if bad:
            raise ValueError(
                f"values_{name} has {bad} null/separator-bearing value(s); "
                "composite keys must be SEP-free strings"
            )
    return np.array([x + SEP + y for x, y in zip(a, b)], dtype=object)


def rare_terms_search(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    max_doc_count: int,
    cfg: PipelineConfig | None = None,
    **facet_kwargs,
) -> pd.DataFrame:
    """queries (query_id, text) -> (query_id, facet, n_docs) rows for
    attribute values matched by AT MOST ``max_doc_count`` docs of the
    query's disjunctive match set (ES rare_terms, exact — module
    docstring).  The distributed stage is faceted_search verbatim; the
    cut is corpus-independent driver math."""
    from mini_ivf_ray.pipelines.facets import faceted_search

    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    panel = faceted_search(
        index_dir, queries_ds, facet_ids, facet_values, cfg, **facet_kwargs
    ).to_pandas()
    return rare_cut(panel, max_doc_count)


def multi_terms_search(
    index_dir: str,
    queries_ds,
    facet_ids,
    values_a,
    values_b,
    num_buckets: int,
    cfg: PipelineConfig | None = None,
    **facet_kwargs,
) -> pd.DataFrame:
    """queries (query_id, text) -> up to ``num_buckets`` (query_id,
    key_a, key_b, n_docs) rows per query: the match set's most common
    composite attribute pairs, (count desc, key_a asc, key_b asc) —
    ES multi_terms, exact (module docstring).  Counting is
    faceted_search over the SEP-joined composite label."""
    from mini_ivf_ray.pipelines.facets import faceted_search

    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    labels = _composite_labels(values_a, values_b)
    panel = faceted_search(
        index_dir, queries_ds, facet_ids, labels, cfg, **facet_kwargs
    ).to_pandas()
    return multi_cut(panel, num_buckets)
