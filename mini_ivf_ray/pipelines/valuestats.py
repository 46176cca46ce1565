"""Field-value metadata aggregations over the match set — three ES
aggregations computed in ONE pass over one (doc_id, code) sidecar:

  cardinality  — EXACT distinct count of the field's values among
                 matched docs carrying the field (ES's cardinality agg
                 is HLL-approximate; a keyword field's dictionary is
                 panel-sized, so the exact count is one
                 count_nonzero over the facet panel — documented
                 divergence: exact, not approximate)
  value_count  — matched docs that CARRY the field (panel sum)
  missing      — matched docs that do NOT (n_matched - value_count;
                 ES's missing agg)

The sidecar convention is facets.py's: docs missing the field are
simply absent from the (doc_id, code) arrays.  Counting rides the
same disjunctive-match panel machinery (FacetCounter), so the scale
shape is identical — sidecar broadcast once in the single-index path,
range-sliced per shard in doc-sharded serving where the per-shard
partial is the sparse (code, n) panel row set plus one matched-count
row; panels merge additively across disjoint doc ranges and
cardinality is derived from the MERGED panel (a nonzero count is not
additive, the merged panel is).

Queries with an empty match set emit no row (ES: no buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.pipelines.facets import FacetCounter


class ValueStatsCounter(FacetCounter):
    """Actor-pool stage: (query_id, text) -> one row per non-empty
    query: (query_id, n_matched, value_count, cardinality, missing)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "query_id": [], "n_matched": [], "value_count": [],
            "cardinality": [], "missing": [],
        }
        for qid, qtext in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            docs = self.disjunctive_matches_for_text(qtext)
            if not docs.size:
                continue
            idx = np.searchsorted(self.facet_ids, docs)
            np.minimum(idx, max(self.facet_ids.size - 1, 0), out=idx)
            valid = (
                self.facet_ids[idx] == docs
                if self.facet_ids.size
                else np.zeros(docs.size, dtype=bool)
            )
            panel = np.bincount(
                self.facet_codes[idx[valid]],
                minlength=len(self.facet_labels),
            )
            vc = int(panel.sum())
            out["query_id"].append(qid)
            out["n_matched"].append(int(docs.size))
            out["value_count"].append(vc)
            out["cardinality"].append(int(np.count_nonzero(panel)))
            out["missing"].append(int(docs.size) - vc)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "n_matched": pa.array(out["n_matched"], type=pa.int64()),
                "value_count": pa.array(out["value_count"], type=pa.int64()),
                "cardinality": pa.array(out["cardinality"], type=pa.int64()),
                "missing": pa.array(out["missing"], type=pa.int64()),
            }
        )


def value_stats_search(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    cfg: PipelineConfig | None = None,
    share: str | bool = "decoded",
    respect_deletes: bool = True,
):
    """queries (query_id, text) -> (query_id, n_matched, value_count,
    cardinality, missing) over a doc->keyword-field sidecar covering
    only the docs that CARRY the field (faceted_search's contract)."""
    import ray

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    ids = np.asarray(facet_ids, dtype=np.uint64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    vals = pa.array(
        np.asarray(facet_values, dtype=object)[order], type=pa.string()
    )
    if vals.null_count:
        raise ValueError(
            f"facet_values contains {vals.null_count} null(s); a doc "
            "missing the field belongs OUT of the sidecar, not in it "
            "as a null"
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

    from mini_ivf_ray.pipelines.serving import _tombstone_ref

    denied_ref = _tombstone_ref(index_dir) if respect_deletes else None
    facet_ref = ray.put((ids, codes))
    return queries_ds.map_batches(
        ValueStatsCounter,
        fn_constructor_args=(
            index_dir, cfg, shared, decoded, facet_ref, labels, denied_ref,
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, cfg.query_concurrency),
        num_cpus=1,
    )
