"""Web-corpus operators over the pages source: URL canonicalization,
canonical-URL dedup, per-domain aggregates.

All stateless vectorized ``map_batches`` plus ONE bounded groupby
(domain-level aggregate rows are slim: per-batch partial counts are
combined first, so the exchange carries O(batches x domains-per-batch)
rows, never O(pages)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.urls import canonicalize_url, host_of, registered_domain


def _canon_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    dom = [registered_domain(host_of(u)) for u in canon]
    return pa.table(
        {
            "url": batch["url"],
            "url_canon": pa.array(canon, type=pa.string()),
            "domain": pa.array(dom, type=pa.string()),
        }
    )


def canonical_urls(pages_ds):
    """(url, url_canon, domain) for every page."""
    return pages_ds.map_batches(_canon_batch, batch_format="pyarrow")


def dedup_by_canonical_url(pages_ds, num_buckets: int = 64):
    """Exact last-write-wins dedup on the CANONICAL url (tracking
    params / default ports / fragments no longer split a page's crawl
    history).  Reuses the build's bucketed url-dedup shuffle."""
    from mini_ivf_ray.functions.hashing import doc_ids_from_urls
    from mini_ivf_ray.stages.prepare import dedup_by_url

    def swap(batch: pa.Table) -> pa.Table:
        urls = [canonicalize_url(u) for u in batch["url"].to_pylist()]
        batch = batch.set_column(
            batch.column_names.index("url"), "url", pa.array(urls, type=pa.string())
        )
        # identity follows the CANONICAL url (dedup_by_url buckets and
        # collision-checks on doc_id = md5-u64(url))
        ids = doc_ids_from_urls(urls)
        if "doc_id" in batch.column_names:
            batch = batch.drop_columns(["doc_id"])
        return batch.append_column("doc_id", pa.array(ids, type=pa.uint64()))

    return dedup_by_url(
        pages_ds.map_batches(swap, batch_format="pyarrow"), num_buckets=num_buckets
    )


def _domain_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (domain, n_pages, n_text_chars) partial rows."""
    urls = batch["url"].to_pylist()
    doms = np.asarray(
        [registered_domain(host_of(canonicalize_url(u))) for u in urls], dtype=object
    )
    nchars = np.fromiter(
        (len(t) for t in batch["text"].to_pylist()), dtype=np.int64, count=len(urls)
    )
    df = pd.DataFrame({"domain": doms, "n": 1, "chars": nchars})
    g = df.groupby("domain", sort=False).agg(n=("n", "sum"), chars=("chars", "sum"))
    return pa.table(
        {
            "domain": pa.array(g.index.to_numpy(dtype=object), type=pa.string()),
            "n_pages": pa.array(g["n"].to_numpy(np.int64), type=pa.int64()),
            "n_chars": pa.array(g["chars"].to_numpy(np.int64), type=pa.int64()),
        }
    )


def domain_stats(pages_ds):
    """Per registered domain: page count + total extracted-text chars.
    Partial-aggregate inside map_batches, then one small groupby."""
    from ray.data.aggregate import Sum

    partials = pages_ds.map_batches(_domain_partials, batch_format="pyarrow")
    return partials.groupby("domain").aggregate(
        Sum("n_pages", alias_name="n_pages"), Sum("n_chars", alias_name="n_chars")
    )
