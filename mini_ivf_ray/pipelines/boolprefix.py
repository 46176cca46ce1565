"""Match-bool-prefix search: Elasticsearch ``match_bool_prefix`` —
the search-as-you-type companion of ``match_phrase_prefix`` WITHOUT
the positional constraint: every token is an independent ``should``
clause, the last token as a PREFIX, so "data str" matches documents
containing "data" anywhere and/or any term expanding "str" anywhere.

Construction, exactly ES's: a bool query of term queries for each
token except the last, which becomes a prefix query.  The prefix
expands to the FIRST ``max_expansions`` dictionary terms in term
order (the ES terms-index walk — ``phraseprefix.expand_prefix``, the
ONE expansion rule this engine pins), and docs reachable only through
a term beyond the cap are not matched through the prefix clause.

Scoring, pinned + documented choice: the prefix clause is rewritten
SCORING_BOOLEAN (Lucene ``SCORING_BOOLEAN_QUERY_REWRITE``) — each
expansion term contributes its own full BM25 weight — so the whole
query degenerates to plain disjunctive BM25 over the UNION of the
fixed tokens and the expansion set, and everything downstream reuses
the exact serving stack bit-for-bit.  (ES's default prefix rewrite
blends a constant score across expansions; the scoring-boolean mode
is the deterministic, SQL-replayable member of Lucene's documented
rewrite family.)  A term that is both a fixed token and an expansion
contributes ONCE (set union — plain BM25 semantics).

Degeneracies pinned by pytest: a last token that exactly equals a
vocab term with nothing else under the cap == plain disjunctive
search bit-identically; an unmatchable prefix leaves the fixed tokens
scoring alone; a single-token query is a pure scored prefix query.

Everything is index-local: one dictionary range scan per query for
the expansion + the standard postings fetch; no shuffle, no sidecar.

The reference has no text-side analog (mini-ivf is vector-only); this
extends SURVEY §2.10's query-side surface next to match_phrase_prefix.
"""

from __future__ import annotations

import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.phraseprefix import expand_prefix


def match_bool_prefix_topk(
    index_dir: str,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    max_expansions: int = 50,
) -> pd.DataFrame:
    """(query_id, rank, doc_id, score) — top cfg.topk under
    match_bool_prefix semantics: disjunctive BM25 over the union of
    the query's fixed tokens and the last token's capped prefix
    expansion."""
    import ray.data

    from mini_ivf_ray.pipelines.query import search
    from mini_ivf_ray.stages.merge import load_dictionary

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    parsed: list[tuple[int, list[str], str]] = []
    for qid, text in queries:
        toks = tokenize(text)
        if not toks:
            raise ValueError(
                f"match_bool_prefix query {qid} has no tokens: {text!r}"
            )
        parsed.append((qid, toks[:-1], toks[-1]))
    sorted_terms = sorted(
        load_dictionary(index_dir)["term"].to_pylist()
    )
    items = []
    for qid, fixed, prefix in parsed:
        union = sorted(
            set(fixed) | set(expand_prefix(sorted_terms, prefix,
                                           max_expansions))
        )
        if union:
            items.append({"query_id": qid, "text": " ".join(union)})
    if not items:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    res = search(index_dir, ray.data.from_items(items), cfg).to_pandas()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)
