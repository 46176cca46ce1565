"""Match-phrase-prefix search: Elasticsearch ``match_phrase_prefix``
(Lucene ``MatchPhrasePrefixQuery``) — the "search-as-you-type" phrase:
the query's last token is a PREFIX, and a document matches when it
contains the fixed tokens as a contiguous sequence immediately
followed by ANY dictionary term expanding the prefix.

Expansion semantics, exactly ES's: the prefix expands to the FIRST
``max_expansions`` dictionary terms in term order (ES walks the terms
index in order and stops — default 50); docs reachable only through a
term beyond the cap are NOT matched.  Both verify backends and the
SQL oracle test membership in the SAME capped set, so the cap is part
of the pinned semantics, not an engine artifact.  The expansion is a
range scan of the sorted dictionary (the wildcard/autocomplete
machinery precedent) — index-local, query-time, corpus-independent.

Verify backends mirror phrase.py's two-stage plan:

1. candidates = conjunctive matches of the FIXED tokens, intersected
   with the union of the expansions' postings (all index-local);
2. positional verify — ``positions="index"`` checks from the
   positions store only (mode ``"phrase_prefix"``: the fixed chain's
   phrase intersection with the UNION of the doc's expansion position
   lists as the final slot), ``"corpus"`` re-tokenizes candidates and
   scans for fixed-chain + expansion-member at the next slot, both
   exact and pytest-pinned identical.

Scoring, pinned + documented divergence: ranked by the conjunctive
BM25 score of the FIXED tokens only, (score desc, doc asc) — the
expansion gates matching but contributes no score.  Lucene blends
expansion terms with deliberately de-weighted idf (a constant-score
union); taking that weight to 0 keeps ranking deterministic and
SQL-replayable instead of depending on which expansion matched.
Consequently a query needs >= 1 fixed token (a bare prefix is the
prefix/autocomplete query family, already served elsewhere) —
validated loudly.

Reference analogy: the per-cluster payload gather of
index_ivfpq.cpp:111-117, applied to the positional payload store.
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np
import pandas as pd

from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import BM25Searcher, _topk_exact


def expand_prefix(sorted_terms: list[str], prefix: str,
                  max_expansions: int) -> list[str]:
    """The FIRST ``max_expansions`` dictionary terms with ``prefix``,
    in term order — ES's terms-index walk, the ONE expansion rule the
    engine, both backends, and the SQL oracle share."""
    if not prefix:
        raise ValueError("empty prefix")
    if max_expansions < 1:
        raise ValueError(
            f"max_expansions must be >= 1, got {max_expansions}"
        )
    i = bisect_left(sorted_terms, prefix)
    out = []
    while i < len(sorted_terms) and len(out) < max_expansions:
        if not sorted_terms[i].startswith(prefix):
            break
        out.append(sorted_terms[i])
        i += 1
    return out


def contains_prefix_phrase(tokens: list[str], fixed: list[str],
                           expansions: set[str]) -> bool:
    """Token-stream check: fixed tokens contiguous, next token in the
    capped expansion set — the corpus-verify kernel."""
    k = len(fixed)
    for s in range(len(tokens) - k):
        if tokens[s : s + k] == fixed and tokens[s + k] in expansions:
            return True
    return False


class _PrefixPhraseVerifier:
    """Corpus-verify map_batches stage (the phrase.py pattern):
    re-tokenize candidate docs, run the token-stream kernel."""

    def __init__(self, cand_ref, items):
        import ray

        self.cand = ray.get(cand_ref)
        self.items = items  # (qid, fixed_tokens, expansion_list)
        union = [v for v in self.cand.values() if v.size]
        self.union_cand = (
            np.unique(np.concatenate(union))
            if union
            else np.empty(0, dtype=np.uint64)
        )

    def __call__(self, batch):
        import pyarrow as pa

        from mini_ivf_ray.functions.tokenize import tokenize_batch

        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        keep = np.isin(ids, self.union_cand)
        out_q: list[int] = []
        out_d: list[int] = []
        if keep.any():
            rows = np.flatnonzero(keep)
            toks, _ = tokenize_batch(
                batch["text"].take(pa.array(rows)).to_pylist()
            )
            for i, tl in zip(rows.tolist(), toks):
                d = int(ids[i])
                for qid, fixed, exps in self.items:
                    c = self.cand.get(qid)
                    if c is None or not c.size:
                        continue
                    j = np.searchsorted(c, np.uint64(d))
                    if j >= c.size or c[j] != np.uint64(d):
                        continue
                    if contains_prefix_phrase(tl, fixed, set(exps)):
                        out_q.append(qid)
                        out_d.append(d)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(
                    np.array(out_d, dtype=np.uint64), type=pa.uint64()
                ),
            }
        )


def match_phrase_prefix_topk(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    cfg: PipelineConfig | None = None,
    max_expansions: int = 50,
    positions: str = "auto",
) -> pd.DataFrame:
    """Top-k match_phrase_prefix: (query_id, rank, doc_id, score) for
    docs containing each query's fixed tokens contiguously followed by
    an expansion of its final-token prefix, ranked by the fixed-token
    conjunctive BM25 score (module docstring).  The LAST whitespace
    token of each query text is the prefix."""
    import ray

    from mini_ivf_ray.pipelines.phrase import _resolve_positions_mode
    from mini_ivf_ray.pipelines.query import _allowed_mask

    cfg = cfg if cfg is not None else PipelineConfig.from_index(index_dir)
    use_index = _resolve_positions_mode(index_dir, positions)
    searcher = BM25Searcher(index_dir, cfg)
    dictionary = sorted(searcher.stats.df)

    items = []  # (qid, fixed_tokens, expansion_list)
    cand: dict[int, np.ndarray] = {}
    cand_scores: dict[int, dict[int, float]] = {}
    for qid, text in queries:
        toks = tokenize(text)
        if len(toks) < 2:
            raise ValueError(
                "match_phrase_prefix needs >= 1 fixed token before the "
                f"prefix, got {text!r}"
            )
        fixed, prefix = toks[:-1], toks[-1]
        exps = expand_prefix(dictionary, prefix, max_expansions)
        docs, scores = searcher.conjunctive_matches_for_text(
            " ".join(fixed)
        )
        if docs.size and exps:
            # prune to docs carrying >= 1 expansion (index-local)
            parts = []
            for e in exps:
                ed, _ = searcher.conjunctive_matches_for_text(e)
                if ed.size:
                    parts.append(ed)
            if parts:
                eu = np.unique(np.concatenate(parts))
                m = _allowed_mask(docs, eu)
                docs, scores = docs[m], scores[m]
            else:
                docs = docs[:0]
                scores = scores[:0]
        elif not exps:
            docs = docs[:0]
            scores = scores[:0]
        cand[qid] = docs
        cand_scores[qid] = dict(zip(docs.tolist(), scores.tolist()))
        if docs.size:
            items.append((qid, fixed, exps))

    verified: dict[int, np.ndarray] = {}
    if items and use_index:
        from mini_ivf_ray.pipelines.positions import positional_hits

        hits = positional_hits(
            index_dir, cand, items, "phrase_prefix", cfg
        )
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )
    elif items:
        cand_ref = ray.put({q: cand[q] for q, *_ in items})
        hits = docs_ds.map_batches(
            _PrefixPhraseVerifier,
            fn_constructor_args=(cand_ref, items),
            batch_format="pyarrow",
            concurrency=(1, cfg.query_concurrency),
            num_cpus=1,
        ).to_pandas()
        for qid, grp in hits.groupby("query_id"):
            verified[int(qid)] = np.sort(
                grp["doc_id"].to_numpy().astype(np.uint64)
            )

    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, _ in queries:
        docs = verified.get(qid)
        if docs is None or not len(docs):
            continue
        smap = cand_scores[qid]
        scores = np.array([smap[int(d)] for d in docs], dtype=np.float64)
        for r, (d, s) in enumerate(_topk_exact(docs, scores, cfg.topk)):
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(d)
            out["score"].append(s)
    df = pd.DataFrame(out)
    if len(df):
        df["doc_id"] = df["doc_id"].astype(np.uint64)
    return df
