"""Text categorization aggregation — the deterministic token-template
variant of Elasticsearch's ``categorize_text`` aggregation (the
log-pattern bucketer): documents are grouped by a TEMPLATE KEY built
from their first ``max_tokens`` tokens with every digit-bearing token
replaced by ``#``, and the aggregation reports the top categories by
document count.

Documented divergence: ES's categorize_text clusters with an
ML-adjacent drain-style algorithm whose buckets depend on corpus
order and similarity thresholds; this engine pins the classic
deterministic simplification of the same idea (numbers are the
variable part of log/web text — mask them, key on the prefix
template), which makes the bucketing order-independent, exactly
mergeable across any partitioning, and SQL-replayable
(``regexp_matches(t, '[0-9]') -> '#'`` per token).  A document with
no tokens falls in the empty-string category (ES drops it; pinned
here as the '' bucket so counts total the corpus — both behaviors
are defensible, ours keeps the aggregation lossless).

Ray-Data-first shape:

  * ONE ``map_batches`` pass tokenizes each block and emits per-block
    PARTIAL (category, n) counts — block-cardinality rows, never
    per-doc rows;
  * a ``groupby("category").sum`` exchange merges partials (category
    cardinality is template-bounded, far below doc count);
  * a second streamed pass emits per-block partial top-``topn`` by
    (count desc, category asc); the driver merges (blocks x topn)
    slim rows and cuts the final page.

The reference has no text-side analog (mini-ivf is vector-only); this
extends the training-data analysis family (langid / quality /
fingerprints) with the log-categorization shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import TOKEN_RE

_DIGIT = "0123456789"


def template_key(text: str, max_tokens: int) -> str:
    """First ``max_tokens`` tokens, digit-bearing tokens masked '#'."""
    toks = TOKEN_RE.findall(text.lower())[:max_tokens]
    return " ".join(
        "#" if any(c in _DIGIT for c in t) else t for t in toks
    )


def categorize_text(
    docs_ds, max_tokens: int = 3, topn: int = 20
) -> pd.DataFrame:
    """(rank, category, n_docs) — the ``topn`` template categories by
    (count desc, category asc).  ``docs_ds`` needs a ``text`` column."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if topn < 1:
        raise ValueError(f"topn must be >= 1, got {topn}")

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            k = template_key(t or "", max_tokens)
            counts[k] = counts.get(k, 0) + 1
        return pa.table(
            {
                "category": pa.array(list(counts), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    merged = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("category")
        .sum("n")
    )

    def block_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.rename(columns={"sum(n)": "n"})
        df = df.sort_values(
            ["n", "category"], ascending=[False, True], kind="mergesort"
        ).head(topn)
        return pa.table(
            {
                "category": pa.array(df["category"].tolist(), type=pa.string()),
                "n": pa.array(df["n"].to_numpy().astype(np.int64),
                              type=pa.int64()),
            }
        )

    cand = merged.map_batches(block_top, batch_format="pyarrow").to_pandas()
    if not len(cand):
        return pd.DataFrame(
            {
                "rank": pd.Series([], dtype=np.int64),
                "category": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    cand = cand.sort_values(
        ["n", "category"], ascending=[False, True], kind="mergesort"
    ).head(topn).reset_index(drop=True)
    out = pd.DataFrame(
        {
            "rank": np.arange(len(cand), dtype=np.int64),
            "category": cand["category"],
            "n_docs": cand["n"].to_numpy().astype(np.int64),
        }
    )
    return out
