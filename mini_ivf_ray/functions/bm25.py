"""BM25 scoring kernel (replaces the L2 distance kernel, distance.cpp).

Canonical accumulation contract (rank-identity, BASELINE.json north_rule):
every scorer in this repo — the WAND engine, the distributed exhaustive
scorer, the local brute-force oracle — computes

    score(q, d) = sum over the query's DISTINCT terms, iterated in
                  LEXICOGRAPHIC order, of float64 contribution
                  idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (always positive).
Identical operand order + float64 everywhere => bit-identical sums =>
rank-identical top-k with tie-break (score desc, doc_id asc).  This is
the analog of mini-ivf's fixed ``partial_sort`` by ascending distance
(index_ivf.cpp:222-234), strengthened from recall@k to rank-identity.
"""

from __future__ import annotations

import math

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(df: float, n_docs: float) -> float:
    """Positive idf (Lucene-style).  float64."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1_DEFAULT, b: float = B_DEFAULT
) -> np.ndarray:
    """Vectorized float64 tf normalization for arrays of tf, dl."""
    tf64 = tf.astype(np.float64)
    denom = tf64 + k1 * (1.0 - b + b * (dl.astype(np.float64) / avgdl))
    return tf64 * (k1 + 1.0) / denom


def contributions(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Per-posting float64 BM25 contribution of one term."""
    return idf(df, n_docs) * tf_norm(tf, dl, avgdl, k1, b)


def duckdb_score_expr(k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> str:
    """The matching DuckDB SQL fragment (templated over column names
    tf, dl, df and scalars N, avgdl) used by oracle builders."""
    return (
        "ln(1 + ({N} - df + 0.5)/(df + 0.5)) * "
        f"(tf * ({k1} + 1.0)) / (tf + {k1} * (1.0 - {b} + {b} * dl / {{avgdl}}))"
    ).replace("{N}", "{N}")
