"""Corpus-statistics pass — the "Train" analog (SURVEY T3).

Reference: ``IndexIVF::Train`` samples vectors and fits the coarse
codebook (index_ivf.cpp:39-70).  Ours scans the (deduped) corpus once,
computing global N, total token count, max doc_id, and per-term df/cf.
Pre-aggregated per batch inside ``map_batches`` (one row per distinct
term per batch + one sentinel row per batch for the globals), then ONE
small ``groupby(term)`` over partials — the input shuffle volume is
O(batches x batch-vocab), not O(postings).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from mini_ivf_ray.functions.tokenize import term_freqs
from mini_ivf_ray.state.stats import CorpusStats

# sentinel term for per-batch global counters ("" is never a token)
_GLOBAL = ""


def stats_partials(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    # clamped to int64: only meaningful for dense external ids
    # (doc_id_from_url=False); hashed ids use the full 2^64 space anyway
    max_doc_id = (
        min(int(batch["doc_id"].to_numpy().max()), 2**63 - 1) if batch.num_rows else 0
    )
    df: Counter = Counter()
    cf: Counter = Counter()
    total_tokens = 0
    for text in texts:
        tfs = term_freqs(text)
        df.update(tfs.keys())
        cf.update(tfs)
        total_tokens += sum(tfs.values())
    terms = list(df.keys())
    n = len(terms)
    return pa.table(
        {
            "term": pa.array(terms + [_GLOBAL], type=pa.string()),
            "df": pa.array([df[t] for t in terms] + [0], type=pa.int64()),
            "cf": pa.array([cf[t] for t in terms] + [0], type=pa.int64()),
            "dl": pa.array([0] * n + [total_tokens], type=pa.int64()),
            "nd": pa.array([0] * n + [len(texts)], type=pa.int64()),
            "mx": pa.array([0] * n + [max_doc_id], type=pa.int64()),
        }
    )


def compute_stats(
    docs_ds, batch_size: int = 1024, driver_threshold: int = 5_000_000
) -> CorpusStats:
    """-> (CorpusStats, diagnostics).  The aggregated result is
    vocab-sized; it is collected to the driver here (sandbox scale) but
    persists as Parquet via ``CorpusStats.save`` — at 10^12-doc scale the
    same aggregate would stream straight to that sidecar instead of
    through the driver.

    Adaptive reduce (r3, VERDICT wrong #6): the partial stream is
    O(batches x batch-vocab); when it is small, a driver-side pandas
    groupby beats the Ray sort-exchange's flat latency floor by ~2x
    (memory pitfall #12).  Above the threshold the distributed groupby
    path runs unchanged."""
    from ray.data.aggregate import Max, Sum

    import ray

    partials = docs_ds.map_batches(
        stats_partials, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    if partials.count() <= driver_threshold:
        import pandas as pd

        df = partials.to_pandas()
        g = df.groupby("term", sort=False).agg(
            df=("df", "sum"), cf=("cf", "sum"), dl=("dl", "sum"),
            nd=("nd", "sum"), mx=("mx", "max"),
        ).reset_index()
        tbl = pa.Table.from_pandas(g, preserve_index=False)
    else:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        agg = (
            partials.repartition(max(8, n_cpus))  # coalesce: cheap M x R sort exchange
            .groupby("term")
            .aggregate(
                Sum("df", alias_name="df"),
                Sum("cf", alias_name="cf"),
                Sum("dl", alias_name="dl"),
                Sum("nd", alias_name="nd"),
                Max("mx", alias_name="mx"),
            )
        )
        tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_numpy()
    cfs = tbl["cf"].to_numpy()
    n_docs = int(tbl["nd"].to_numpy().sum())
    total_tokens = int(tbl["dl"].to_numpy().sum())
    stats = CorpusStats(
        n_docs=n_docs,
        total_tokens=total_tokens,
        max_doc_id=int(tbl["mx"].to_numpy().max()) if tbl.num_rows else 0,
        df={t: int(d) for t, d in zip(terms, dfs) if t != _GLOBAL},
        cf={t: int(c) for t, c in zip(terms, cfs) if t != _GLOBAL},
    )
    return stats
