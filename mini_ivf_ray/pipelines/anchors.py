"""Anchor-text retrieval (classic web IR: Craswell/Hawking/Robertson
2001, "Effective site finding using link anchor information"): score a
page by the BM25 of the anchor text of its IN-LINKS rather than its own
body.  On the real web the anchor is the <a>...</a> text of each href;
the synthetic stand-in here uses each source page's first ``k_tokens``
body tokens as the anchor it puts on every out-link (deterministic, and
SQL-replayable via list_slice over the same token regex).

The scale-shaped piece is ``anchor_pages``: a DERIVED CORPUS builder —
one streamed tokenize pass over the documents, ONE bucketed hash join
(anchors onto edges by src), ONE groupby exchange (anchor multiset by
dst) — whose output feeds the UNCHANGED build/serve stack
(pipelines/build.py SPIMI -> pipelines/query.py search).  Nothing here
is a new retrieval engine: the anchor corpus is just another pages
dataset, so WAND/MaxScore, tombstones, sharded serving and the rest
apply to it for free.  That composition mirrors the reference's reuse
of one index type for derived vector sets (mini-ivf index_ivfpq.hpp —
the same index serves raw and residual encodings).

Semantics pinned here and in the SQL oracle:

* a page enters the anchor corpus iff it has >= 1 in-link whose source
  page has >= 1 token (empty-text sources contribute nothing; a page
  linked ONLY by empty sources is absent, matching SQL's unnest of an
  empty list);
* parallel edges each contribute their anchor once (multigraph
  semantics, like pagerank/hits);
* BM25 statistics (N, avgdl, df) are computed over the ANCHOR corpus,
  not the body corpus — the derived corpus is the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.extract import wrap_html
from mini_ivf_ray.functions.tokenize import tokenize


def anchor_texts_batch(batch: pa.Table, k_tokens: int) -> pa.Table:
    """(doc_id, text) -> (src, anchor): each page's first ``k_tokens``
    tokens joined with single spaces — the anchor string it stamps on
    every out-link.  Pages with zero tokens emit no row."""
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    out_src: list[int] = []
    out_anchor: list[str] = []
    for i, text in enumerate(batch["text"].to_pylist()):
        toks = tokenize(text or "")[:k_tokens]
        if toks:
            out_src.append(int(ids[i]))
            out_anchor.append(" ".join(toks))
    return pa.table(
        {
            "src": pa.array(out_src, type=pa.int64()),
            "anchor": pa.array(out_anchor, type=pa.string()),
        }
    )


def anchor_pages(docs_ds, edges_ds, k_tokens: int = 4,
                 num_buckets: int | None = None):
    """documents (doc_id, text) x edges (src, dst) -> the anchor-corpus
    pages Dataset (url, warc_ts, html, text, lang, doc_id), ready for
    ``build_index(..., dedup=False)`` with ``doc_id_from_url=False``.

    One tokenize pass + one bucketed hash join + one groupby exchange;
    anchor strings are k-token slivers, so the exchange volume is
    O(edges x k), never O(corpus text)."""
    from mini_ivf_ray.pipelines.relational import bucketed_hash_join

    def _tok(batch: pa.Table) -> pa.Table:
        return anchor_texts_batch(batch, k_tokens)

    anchors = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _tok, batch_format="pyarrow"
    )
    joined = bucketed_hash_join(
        edges_ds.select_columns(["src", "dst"]),
        anchors,
        on="src",
        num_buckets=num_buckets,
    )

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        # src-ordered concatenation: deterministic stored bytes (BM25
        # itself is order-invariant — the multiset is what scores)
        df = df.sort_values("src", kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": [int(df["dst"].iloc[0])],
                "text": [" ".join(df["anchor"])],
            }
        )

    corpus = joined.groupby("dst").map_groups(_agg, batch_format="pandas")

    def _pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        texts = batch["text"].to_pylist()
        urls = [f"https://anchors.example/{i}" for i in ids]
        ts = pa.array(
            np.full(len(urls), np.datetime64("2024-01-01T00:00:00", "us"))
        )
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": ts,
                "html": pa.array(
                    [wrap_html(t, u) for t, u in zip(texts, urls)],
                    type=pa.binary(),
                ),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["xx"] * len(urls), type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    return corpus.map_batches(_pages, batch_format="pyarrow")
