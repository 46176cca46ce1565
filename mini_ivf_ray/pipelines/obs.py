"""Query observability: the QueryObs analog.

Reference analog: ``QueryObs`` (index_ivfpq.cpp:412-470) — for a query
workload it histograms, per CLUSTER, how many ground-truth neighbours
live there vs how many clusters the query probed, the main tool for
tuning nprobe / ncentroids.  The fulltext analog histograms, per
PARTITION, how often the workload touches it (``probes``), how many
postings it contributes to evaluation (``postings``), and how many of
the returned top-k results it "owns" (``hits`` — one per (result doc,
matching query term) pair whose posting lives in that partition, the
exact position the salt plan routed it to).  Skewed ``hits`` against
flat ``probes`` says the salt plan under-splits a hot term; partitions
with probes but near-zero hits are candidates for coarser salting.

Driver-side over one cold reader by design: an observability sweep is
a small diagnostic workload (the reference runs QueryObs on the test
query set, not in serving), so the O(queries x terms) python loop is
not a serving-path concern; the per-term work is vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.hashing import salt_of_doc_ids
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, topk_from_blocks


def ivf_observations(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    use_pq: bool = False,
) -> pd.DataFrame:
    """The reference's QueryObs itself (index_ivfpq.cpp:412-470): for an
    IVF index and a query matrix, histogram per PARTITION how many of
    each query's FULL-PROBE top-k (the ground truth the probe list is
    trying to cover) live there, vs which partitions nprobe actually
    probed — the tool for tuning nprobe / n_centroids.

    -> (partition, probes, scored, gt_hits, gt_hits_probed), partition
    asc.  sum(gt_hits_probed) / sum(gt_hits) is exactly the workload's
    probe recall: skew in gt_hits against flat probes says the probe
    list is too short (or the centroids too coarse) for this workload.

    Driver-side by design (an observability sweep is a small diagnostic
    workload, like the reference's); the id->partition map costs one
    ids-column read per partition."""
    from mini_ivf_ray.pipelines.similarity import _ID_COL, IVFSearcher
    from mini_ivf_ray.state import manifest as mf

    import os

    import pyarrow.parquet as pq

    approx = IVFSearcher(index_dir, k=k, nprobe=nprobe, use_pq=use_pq)
    n_cent = len(approx.cent)
    exact = IVFSearcher(index_dir, k=k, nprobe=n_cent, use_pq=use_pq)

    # vec_id -> partition (ids-column-only read per partition)
    id_arrays, part_arrays = [], []
    for p in range(n_cent):
        path = os.path.join(mf.partition_dir(index_dir, p), "vectors.parquet")
        if not os.path.exists(path):
            continue
        ids = pq.read_table(path, columns=[_ID_COL])[_ID_COL].to_numpy()
        id_arrays.append(ids.astype(np.int64))
        part_arrays.append(np.full(ids.size, p, dtype=np.int64))
    all_ids = np.concatenate(id_arrays) if id_arrays else np.empty(0, np.int64)
    all_parts = (
        np.concatenate(part_arrays) if part_arrays else np.empty(0, np.int64)
    )
    order = np.argsort(all_ids, kind="stable")
    all_ids, all_parts = all_ids[order], all_parts[order]

    def part_of(ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(all_ids, ids.astype(np.int64))
        pos = np.minimum(pos, max(0, all_ids.size - 1))
        if all_ids.size and not (all_ids[pos] == ids.astype(np.int64)).all():
            raise AssertionError("ivf_observations: result id not in index")
        return all_parts[pos]

    probes_c: dict[int, int] = {}
    scored_c: dict[int, int] = {}
    gt_c: dict[int, int] = {}
    gt_probed_c: dict[int, int] = {}
    for q in np.asarray(queries, dtype=np.float64):
        if approx.metric == "cosine":
            qn = q / (np.linalg.norm(q) or 1.0)
        else:
            qn = q
        cd = ((approx.cent - qn) ** 2).sum(1)
        W = min(nprobe, n_cent)
        probed = set(
            int(x) for x in np.argpartition(cd, W - 1)[:W]
        )
        for p in probed:
            probes_c[p] = probes_c.get(p, 0) + 1
            ids, _, _, _ = approx._load_part(p)
            scored_c[p] = scored_c.get(p, 0) + int(len(ids))
        gt_ids, _, _ = exact.query_one(q)
        for p in part_of(gt_ids):
            p = int(p)
            gt_c[p] = gt_c.get(p, 0) + 1
            if p in probed:
                gt_probed_c[p] = gt_probed_c.get(p, 0) + 1
    total_gt = sum(gt_c.values())
    total_hit = sum(gt_probed_c.values())
    if total_hit > total_gt:
        raise AssertionError("ivf_observations: probed hits exceed gt hits")
    parts = sorted(set(probes_c) | set(gt_c))
    return pd.DataFrame(
        {
            "partition": pd.Series(parts, dtype=np.int64),
            "probes": pd.Series(
                [probes_c.get(p, 0) for p in parts], dtype=np.int64
            ),
            "scored": pd.Series(
                [scored_c.get(p, 0) for p in parts], dtype=np.int64
            ),
            "gt_hits": pd.Series(
                [gt_c.get(p, 0) for p in parts], dtype=np.int64
            ),
            "gt_hits_probed": pd.Series(
                [gt_probed_c.get(p, 0) for p in parts], dtype=np.int64
            ),
        }
    )


def query_observations(
    index_dir: str,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
) -> pd.DataFrame:
    """-> (partition, probes, postings, hits) per partition touched by
    the workload, partition ascending.

    probes    — number of (query, term) lookups routed to the partition
    postings  — postings of those terms stored there (evaluation work)
    hits      — (top-k result doc, matching query term) pairs whose
                posting lives there (result mass; reference: per-cluster
                ground-truth hit counts)

    Invariants (asserted): every returned hit partition was probed;
    summed hits >= total result rows (each top-k doc matches >= 1 query
    term) and <= results x query terms."""
    searcher = BM25Searcher(index_dir, cfg)
    stats, qcfg = searcher.stats, searcher.cfg
    space = 2**64 if qcfg.doc_id_from_url else stats.max_doc_id + 1

    probes: dict[int, int] = {}
    postings: dict[int, int] = {}
    hits: dict[int, int] = {}
    n_results = 0
    hit_ceiling = 0
    for _, qtext in queries:
        terms = sorted(set(tokenize(qtext)))
        wanted = {
            t: stats.term_locations(t, qcfg)
            for t in terms
            if stats.df.get(t, 0) > 0
        }
        fetched = searcher.reader.fetch_terms(wanted)
        res = topk_from_blocks(fetched, stats, qcfg)
        top_docs = np.array(sorted(d for d, _ in res), dtype=np.uint64)
        n_results += len(res)
        hit_ceiling += len(res) * len(wanted)
        for t, locs in wanted.items():
            blocks = fetched[t]
            if blocks is None:
                continue
            docs, _ = blocks.all_postings()
            # which of this term's postings are top-k result docs
            if docs.size and top_docs.size:
                pos = np.minimum(
                    np.searchsorted(docs, top_docs), docs.size - 1
                )
                matched = top_docs[docs[pos] == top_docs]
            else:
                matched = np.empty(0, dtype=np.uint64)
            uniq_locs = list(dict.fromkeys(locs))
            for p in uniq_locs:
                probes[p] = probes.get(p, 0) + 1
            if len(uniq_locs) == 1:
                p = uniq_locs[0]
                postings[p] = postings.get(p, 0) + int(docs.size)
                hits[p] = hits.get(p, 0) + int(matched.size)
            else:
                # salted term: slot -> partition via the exact integer
                # range boundaries the assigner/encoder used
                slot_posts = np.bincount(
                    salt_of_doc_ids(docs, len(uniq_locs), space),
                    minlength=len(uniq_locs),
                )
                slot_hits = (
                    np.bincount(
                        salt_of_doc_ids(matched, len(uniq_locs), space),
                        minlength=len(uniq_locs),
                    )
                    if matched.size
                    else np.zeros(len(uniq_locs), dtype=np.int64)
                )
                for s, p in enumerate(uniq_locs):
                    postings[p] = postings.get(p, 0) + int(slot_posts[s])
                    hits[p] = hits.get(p, 0) + int(slot_hits[s])

    total_hits = sum(hits.values())
    if total_hits < n_results:
        raise AssertionError(
            f"query_observations: {total_hits} hits < {n_results} results "
            "— a top-k doc matched no probed partition"
        )
    if total_hits > hit_ceiling:
        raise AssertionError(
            f"query_observations: {total_hits} hits exceed the "
            f"results x terms ceiling {hit_ceiling}"
        )
    parts = sorted(probes)
    return pd.DataFrame(
        {
            "partition": pd.Series(parts, dtype=np.int64),
            "probes": pd.Series([probes[p] for p in parts], dtype=np.int64),
            "postings": pd.Series(
                [postings.get(p, 0) for p in parts], dtype=np.int64
            ),
            "hits": pd.Series([hits.get(p, 0) for p in parts], dtype=np.int64),
        }
    )
