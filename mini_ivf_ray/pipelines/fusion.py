"""Hybrid-retrieval score fusion: Elasticsearch's ``linear`` retriever
(8.16 retriever framework) — the weighted-sum companion of the ``rrf``
retriever (served as ``hybrid_rrf``).

Each sub-retriever returns its per-query top-k WITH raw scores; each
list is normalized per (query, retriever) with the ``minmax``
normalizer

    norm = (s - min) / (max - min)        over that retrieved list,

then fused as ``score = sum_r w_r * norm_r`` with 0 for a doc a
retriever did not return, ranked (score desc, doc asc).

Pinned edge rule: a retrieved list whose scores are all equal (incl. a
singleton list) normalizes to 1.0 for every member — the retriever
DID return the doc, so it must out-contribute absent docs; mapping to
0 (the other defensible choice) would erase the retrieval signal.
Documented as this engine's rule; ES documents no behavior for the
degenerate list.

Weights must be >= 0 (a negative weight inverts a retriever's
ranking; ES validates the same).  Dyadic workload weights keep the
two-term fused sum float64-exact; the normalization itself divides
raw scores, so the driver's 4-dp rounding absorbs last-ulp float
differences between numpy and SQL replays of the sub-scores.

Fusion is per-query over k-sized lists — at corpus scale a map over
query partitions; the driver-side frame math here handles the
workload's 8 x <= 40 rows (the hybrid_rrf precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def minmax_normalize(df: pd.DataFrame, score_col: str) -> pd.Series:
    """Per-query minmax normalization of ``score_col`` over each
    query's retrieved list (all-equal list -> 1.0)."""
    g = df.groupby("query_id")[score_col]
    lo = g.transform("min")
    hi = g.transform("max")
    span = hi - lo
    out = (df[score_col] - lo) / span.where(span > 0, 1.0)
    return out.where(span > 0, 1.0)


def linear_fuse(
    lists: list[tuple[pd.DataFrame, str, float]],
    topk: int,
) -> pd.DataFrame:
    """Fuse per-retriever result frames [(df, score_col, weight)] —
    each df with (query_id, doc_id, score_col) — into
    (query_id, rank, doc_id, score) under the linear/minmax rule."""
    parts = []
    for df, score_col, w in lists:
        w = float(w)
        if w < 0:
            raise ValueError(f"retriever weight must be >= 0, got {w}")
        d = df[["query_id", "doc_id"]].copy()
        d["contrib"] = w * minmax_normalize(df, score_col).to_numpy()
        parts.append(d)
    allp = pd.concat(parts, ignore_index=True)
    fused = (
        allp.groupby(["query_id", "doc_id"], as_index=False)["contrib"]
        .sum()
        .rename(columns={"contrib": "score"})
    )
    fused = fused.sort_values(
        ["query_id", "score", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    fused["rank"] = fused.groupby("query_id").cumcount()
    out = fused[fused["rank"] < topk].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "doc_id", "score"]]
