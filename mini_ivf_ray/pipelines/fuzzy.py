"""Fuzzy full-text search: typo-tolerant BM25 retrieval.

The Lucene ``FuzzyQuery`` plan: every query term expands against the
corpus vocabulary into the terms within Levenshtein distance
``max_edits`` (at most ``per_term`` of them, ranked lev asc / df desc
/ term asc — closest and commonest first), and the union of the
expansions runs as an ordinary disjunctive BM25 query.  Everything
downstream of expansion reuses the exact serving stack, and the whole
operator replays in SQL via DuckDB's ``levenshtein()``.

Ray-Data-first shape: candidate generation is the SymSpell delete-key
pass from ``pipelines/spell.py`` (one streamed dictionary pass, tiny
broadcast query side, zero shuffle) followed by an exact driver-side
DP verify over the handful of candidates — see spell.py's module
docstring for the scale argument.

Determinism: the per-term cap selects by (lev asc, df desc, term asc),
a total order over the unique dictionary, so Ray and the SQL oracle
pick identical expansions; a vocab term reached from several query
terms is deduplicated (DISTINCT on the SQL side, a set here) before
scoring, so each (doc, term) contributes once — plain BM25 semantics.

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface the same way spell /
wildcard / autocomplete do.
"""

from __future__ import annotations

import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize


def fuzzy_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    max_edits: int = 2,
    per_term: int = 8,
    transpositions: bool = False,
) -> pd.DataFrame:
    """(query_id, rank, doc_id, score) — top cfg.topk BM25 results per
    query, scoring the disjunction of each query term's fuzzy
    expansion (vocab terms within ``max_edits``, capped at
    ``per_term`` by lev asc / df desc / term asc).

    ``transpositions=True`` expands under the full Damerau-Levenshtein
    metric instead (adjacent swap = ONE edit) — ES fuzziness'
    ``transpositions: true`` default.  Documented divergence: Lucene's
    FuzzyQuery automaton implements the restricted (OSA) variant,
    which differs from full DL only when an edit lands inside a
    transposed pair (e.g. 'ca'->'abc': DL 2, OSA 3); full DL is what
    DuckDB's ``damerau_levenshtein()`` computes, keeping the operator
    SQL-replayable."""
    import ray.data

    from mini_ivf_ray.pipelines.query import search
    from mini_ivf_ray.pipelines.spell import suggest_terms
    from mini_ivf_ray.stages.merge import load_dictionary

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    terms_by_query: dict[int, list[str]] = {
        qid: tokenize(text) for qid, text in queries
    }
    all_terms = sorted({t for ts in terms_by_query.values() for t in ts})
    if not all_terms:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    d = load_dictionary(index_dir)
    sug = suggest_terms(
        ray.data.from_arrow(d.select(["term", "df"])),
        all_terms,
        max_edits=max_edits,
        topn=per_term,
        transpositions=transpositions,
    )
    expansions: dict[str, list[str]] = (
        {q: list(g["suggestion"]) for q, g in sug.groupby("query")}
        if len(sug)
        else {}
    )
    items = []
    for qid, qterms in terms_by_query.items():
        terms = sorted({e for t in qterms for e in expansions.get(t, [])})
        if terms:
            items.append({"query_id": qid, "text": " ".join(terms)})
    if not items:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    res = search(index_dir, ray.data.from_items(items), cfg).to_pandas()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)
