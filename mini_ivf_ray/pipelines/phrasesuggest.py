"""Phrase suggester: the ES ``phrase`` suggester ("did you mean" over
whole queries) with Laplace smoothing — per-token candidate generation
+ whole-phrase bigram-LM rescoring.

Single-term spell correction (spell.py) can't rank "noise park" vs
"nose park" for the input "noise park": both tokens are valid words;
only PHRASE context separates them.  The ES phrase suggester fixes
this by generating candidate phrases from per-token corrections and
ranking them with an n-gram language model.  This implementation pins
the published contract precisely:

  * **Candidates per token**: the ``per_token`` best dictionary terms
    within ``max_edits`` (SymSpell delete-key generation + exact DP
    verify — spell.suggest_terms), ranked (lev asc, df desc, term
    asc).  A token with no in-vocab candidate stays itself.
  * **Candidate phrases** (``max_errors = 1``, the ES default): the
    original phrase plus every single-position substitution — one
    corrected token per candidate, so the candidate count is
    O(len x per_token), never a cross-product.
  * **Scoring** (ES ``laplace`` smoothing model): add-one bigram LM
    trained on the corpus (lm.BigramModel),

        score(w_1..w_m) = ln (c(w_1)+1)/(N+V)
                        + sum_{i>=2} ln (c(w_{i-1},w_i)+1)/(c(w_{i-1})+V)

    accumulated left-to-right in float64; OOV tokens count 0.
  * **Ranking**: (score desc, phrase asc), top ``topn`` per query.

Scale shape: candidate generation is spell.py's one streamed
dictionary pass (broadcast delete keys, zero shuffle); the LM is
model-sized (Heaps-law vocab) and trained with lm.py's combiner-first
counting pass; phrase assembly + scoring touch only (queries x len x
per_token) rows on the driver — corpus-independent.  The SQL oracle
replays candidate ranking (levenshtein + the same tie-break window),
single-substitution phrase assembly, and the identical Laplace
formula over corpus-derived counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.lm import BigramModel, _encode_tokens, train_bigram_counts
from mini_ivf_ray.pipelines.spell import suggest_terms


def laplace_phrase_score(tokens: list[str], model: BigramModel) -> float:
    """Left-to-right float64 Laplace bigram log-likelihood."""
    if not tokens:
        raise ValueError("cannot score an empty phrase")
    codes = _encode_tokens(np.asarray(tokens, dtype=object), model.vocab_s)
    n_total = np.float64(model.uni_c.sum())
    v = np.float64(model.V)
    uni = np.where(codes >= 0, model.uni_c[np.maximum(codes, 0)], 0).astype(
        np.float64
    )
    total = np.float64(np.log((uni[0] + 1.0) / (n_total + v)))
    if len(codes) > 1:
        big = model.bigram_counts(codes[:-1], codes[1:]).astype(np.float64)
        for i in range(1, len(codes)):
            total = total + np.float64(
                np.log((big[i - 1] + 1.0) / (uni[i - 1] + v))
            )
    return float(total)


def phrase_suggest(
    dictionary_ds,
    docs_ds,
    queries: list[tuple[int, str]],
    max_edits: int = 1,
    per_token: int = 3,
    topn: int = 3,
    model: BigramModel | None = None,
) -> pa.Table:
    """queries [(query_id, text)] -> (query_id, rank, phrase, score):
    the ``topn`` best candidate phrases per query under the Laplace
    bigram LM.  ``dictionary_ds`` is (term, df); ``docs_ds`` trains
    the LM when ``model`` is not supplied."""
    if topn <= 0 or per_token <= 0:
        raise ValueError("topn and per_token must be > 0")
    toks = {qid: tokenize(text) for qid, text in queries}
    for qid, ts in toks.items():
        if not ts:
            raise ValueError(f"query {qid} tokenizes to nothing")
    all_tokens = sorted({t for ts in toks.values() for t in ts})
    cand = suggest_terms(
        dictionary_ds, all_tokens, max_edits=max_edits, topn=per_token
    )
    per_tok: dict[str, list[str]] = {
        q: list(g["suggestion"]) for q, g in cand.groupby("query")
    }
    if model is None:
        model = train_bigram_counts(docs_ds)

    rows = []
    for qid, ts in toks.items():
        phrases = {" ".join(ts)}
        for i, t in enumerate(ts):
            for c in per_tok.get(t, []):
                if c != t:
                    phrases.add(" ".join(ts[:i] + [c] + ts[i + 1:]))
        scored = sorted(
            ((laplace_phrase_score(p.split(" "), model), p) for p in phrases),
            key=lambda sp: (-sp[0], sp[1]),
        )[:topn]
        for r, (s, p) in enumerate(scored):
            rows.append((qid, r, p, s))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "phrase", "score"])
    return pa.table(
        {
            "query_id": pa.array(df["query_id"], type=pa.int64()),
            "rank": pa.array(df["rank"], type=pa.int64()),
            "phrase": pa.array(df["phrase"], type=pa.string()),
            "score": pa.array(df["score"], type=pa.float64()),
        }
    )


def phrase_suggest_for_index(
    index_dir: str,
    docs_ds,
    queries: list[tuple[int, str]],
    max_edits: int = 1,
    per_token: int = 3,
    topn: int = 3,
    model: BigramModel | None = None,
) -> pa.Table:
    """Phrase suggestions sourcing candidates from a committed index's
    dictionary (term, df)."""
    import ray.data

    from mini_ivf_ray.stages.merge import load_dictionary

    d = load_dictionary(index_dir)
    return phrase_suggest(
        ray.data.from_arrow(d.select(["term", "df"])),
        docs_ds,
        queries,
        max_edits=max_edits,
        per_token=per_token,
        topn=topn,
        model=model,
    )
