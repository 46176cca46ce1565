"""Wildcard term search over the index dictionary.

The Lucene ``WildcardQuery`` plan: a pattern with ``*`` (any run) and
``?`` (any single char) is expanded against the corpus vocabulary into
at most ``max_expansions`` concrete terms, which then run as an
ordinary disjunctive BM25 query — so scoring, pruning and ranking all
reuse the exact serving stack, and the whole operator replays in SQL
as ``term LIKE pattern`` feeding the standard BM25 formula.

Ray-Data-first shape (the autocomplete/spell companion):

  * the (tiny) pattern list is broadcast ONCE (``ray.put``);
  * ONE ``map_batches`` pass streams the dictionary; each batch
    matches every pattern with the vectorized Arrow
    ``pyarrow.compute.match_like`` kernel (SQL LIKE semantics,
    zero-copy over the dictionary block) and emits only its PARTIAL
    top-``max_expansions`` per pattern (df desc, term asc) — at most
    ``n_patterns x max_expansions`` slim rows leave each block
    regardless of vocabulary size, and merging partials under the
    same per-term order is exact;
  * the expanded term sets run through the standard ``search()``
    actor pool (surrogate int query ids).

Determinism: the expansion cap selects by (df desc, term asc) — a
total order over the unique dictionary — so Ray and the SQL oracle
pick identical term sets; downstream is the bit-exact BM25 stack.

Patterns are restricted to ``[a-z0-9*?]`` so the ``*``->``%`` /
``?``->``_`` LIKE translation needs no escaping on either side.

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface the same way spell /
autocomplete / regex_search do.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from mini_ivf_ray.config import PipelineConfig

_PATTERN_RE = re.compile(r"^[a-z0-9*?]+$")


def to_like(pattern: str) -> str:
    """``*``/``?`` wildcard pattern -> SQL LIKE pattern."""
    if not _PATTERN_RE.match(pattern):
        raise ValueError(
            f"wildcard pattern must match [a-z0-9*?]+: {pattern!r}"
        )
    return pattern.replace("*", "%").replace("?", "_")


def expand_wildcards(
    dictionary_ds, patterns: list[str], max_expansions: int = 64
) -> pd.DataFrame:
    """(pattern, term, df) — for each pattern the ``max_expansions``
    matching dictionary terms selected by (df desc, term asc).
    ``dictionary_ds`` is a Ray Dataset with (term, df) columns."""
    import ray

    patterns = list(dict.fromkeys(patterns))
    likes = [(p, to_like(p)) for p in patterns]
    bundle_ref = ray.put((likes, max_expansions))

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        pats, cap = _ray.get(bundle_ref)
        term_col = batch["term"]
        dfs_all = batch["df"].to_numpy()
        out_p, out_t, out_df = [], [], []
        terms_np: np.ndarray | None = None
        for p, like in pats:
            mask = pc.match_like(term_col, pattern=like)
            idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            if idx.size == 0:
                continue
            if terms_np is None:
                terms_np = term_col.to_numpy(zero_copy_only=False)
            # partial (df desc, term asc) head — exact under merge
            ts, ds = terms_np[idx], dfs_all[idx]
            order = np.argsort(ts, kind="stable")
            order = order[np.argsort(-ds[order], kind="stable")][:cap]
            out_p.extend([p] * order.size)
            out_t.extend(ts[order])
            out_df.extend(int(x) for x in ds[order])
        return pa.table(
            {
                "pattern": pa.array(out_p, type=pa.string()),
                "term": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_df, type=pa.int64()),
            }
        )

    cands = dictionary_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    rows = []
    if len(cands):
        for p, g in cands.groupby("pattern", sort=True):
            g = g.sort_values(
                ["df", "term"], ascending=[False, True], kind="mergesort"
            ).head(max_expansions)
            rows.extend(
                (p, row["term"], int(row["df"])) for _, row in g.iterrows()
            )
    out = pd.DataFrame(rows, columns=["pattern", "term", "df"])
    if len(out):
        out["df"] = out["df"].astype(np.int64)
    return out


def wildcard_search(
    index_dir: str,
    patterns: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    max_expansions: int = 64,
) -> pd.DataFrame:
    """(query_id, rank, doc_id, score) — top cfg.topk BM25 results per
    pattern, scoring the disjunction of its expanded terms."""
    import ray.data

    from mini_ivf_ray.pipelines.query import search
    from mini_ivf_ray.stages.merge import load_dictionary

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    d = load_dictionary(index_dir)
    exp = expand_wildcards(
        ray.data.from_arrow(d.select(["term", "df"])),
        [p for _, p in patterns],
        max_expansions=max_expansions,
    )
    terms_by_pat: dict[str, list[str]] = (
        {p: list(g["term"]) for p, g in exp.groupby("pattern")}
        if len(exp)
        else {}
    )
    items = [
        {"query_id": qid, "text": " ".join(terms_by_pat[p])}
        for qid, p in patterns
        if terms_by_pat.get(p)
    ]
    if not items:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    res = search(index_dir, ray.data.from_items(items), cfg).to_pandas()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)
