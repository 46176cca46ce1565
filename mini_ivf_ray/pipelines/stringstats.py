"""String stats aggregation: Elasticsearch ``string_stats`` over the
match set — per query, (count, min_length, max_length, avg_length,
entropy) of a keyword field, where entropy is the Shannon entropy
(log base 2, ES's convention) of the CHARACTER distribution across
all the field's values in the match set.

The scale observation this implementation is built on: a keyword
field is dictionary-encoded (the facet machinery), so every statistic
is a function of (a) the per-label match COUNTS — the additive facet
panel — and (b) per-label metadata (length, character-count vector)
computed ONCE driver-side from the panel-sized label dictionary:

    count       = sum_label c_label
    min/max_len = over labels with c_label > 0
    avg_length  = sum_label c_label * len(label) / count
    char_totals = C^T @ c         (C = labels x alphabet count matrix)
    entropy     = -sum_char p * log2(p),  p = char_total / all_chars

So the distributed stage is facets/ShardedIndex.facet_search
VERBATIM (counts merge additively; per-node sidecar is corpus/R) and
the string math is a corpus-independent reduce kernel
(:func:`string_stats_reduce`) shared by the single-index path, the
doc-sharded path, and — expression-for-expression — the SQL oracle.
Exactness: counts and lengths are integers (exact); avg/entropy are
float64 with panel-sized summations, pinned to 4 decimals like every
derived float here.

ES semantics pinned: matched docs missing the field are skipped
(absent from the sidecar); a query with no field-carrying matches
emits NO row; ``entropy`` uses log2 (the ES ``show_distribution``
documentation's Shannon formula).

Reference analogy: QueryObs' per-cluster histogram
(index_ivfpq.cpp:412-470) — the facet histogram re-derived into
string moments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig

STRING_COLUMNS = [
    "query_id", "n_docs", "min_len", "max_len", "avg_len", "entropy",
]


def label_char_matrix(labels: list[str]):
    """(alphabet, C, lengths): C[i, j] = count of alphabet[j] in
    labels[i] — the once-per-dictionary metadata."""
    alphabet = sorted({ch for s in labels for ch in s})
    pos = {ch: j for j, ch in enumerate(alphabet)}
    C = np.zeros((len(labels), len(alphabet)), dtype=np.int64)
    for i, s in enumerate(labels):
        for ch in s:
            C[i, pos[ch]] += 1
    lengths = np.array([len(s) for s in labels], dtype=np.int64)
    return alphabet, C, lengths


def string_stats_reduce(panel: pd.DataFrame) -> pd.DataFrame:
    """The ONE reduce kernel: (query_id, facet, n_docs) panel rows ->
    one string-stats row per query.  Label metadata is rebuilt from
    the panel's own labels (panel-sized)."""
    if not len(panel):
        return pd.DataFrame(columns=STRING_COLUMNS)
    labels = sorted(set(panel["facet"]))
    idx = {s: i for i, s in enumerate(labels)}
    _, C, lengths = label_char_matrix(labels)
    rows = []
    for qid, g in panel.groupby("query_id", sort=True):
        c = np.zeros(len(labels), dtype=np.int64)
        for f, n in zip(g["facet"], g["n_docs"]):
            c[idx[f]] = int(n)
        n = int(c.sum())
        if n == 0:
            continue
        present = c > 0
        min_len = int(lengths[present].min())
        max_len = int(lengths[present].max())
        avg_len = float(c @ lengths) / n
        char_tot = (C.T @ c).astype(np.float64)
        total = float(char_tot.sum())
        p = char_tot[char_tot > 0] / total
        entropy = float(-np.sum(p * np.log2(p)))
        rows.append((int(qid), n, min_len, max_len, avg_len, entropy))
    out = pd.DataFrame(rows, columns=STRING_COLUMNS)
    for col in ("query_id", "n_docs", "min_len", "max_len"):
        out[col] = out[col].astype(np.int64)
    return out


def string_stats_search(
    index_dir: str,
    queries_ds,
    facet_ids,
    facet_values,
    cfg: PipelineConfig | None = None,
    **facet_kwargs,
) -> pd.DataFrame:
    """queries (query_id, text) -> one (query_id, n_docs, min_len,
    max_len, avg_len, entropy) row per query over the keyword field of
    the disjunctive match set (ES string_stats — module docstring).
    The distributed stage is faceted_search verbatim; the string math
    is the corpus-independent reduce kernel."""
    from mini_ivf_ray.pipelines.facets import faceted_search

    panel = faceted_search(
        index_dir, queries_ds, facet_ids, facet_values, cfg, **facet_kwargs
    ).to_pandas()
    return string_stats_reduce(panel)
