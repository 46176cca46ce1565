"""Phrase suggester: brute-force local replay (candidates + Laplace
scoring) bit-identically, phrase context beats raw df, correct phrases
rank first, contracts."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.lm import train_bigram_counts
from mini_ivf_ray.pipelines.phrasesuggest import (
    laplace_phrase_score,
    phrase_suggest,
)
from mini_ivf_ray.pipelines.spell import levenshtein


def _dict_ds(texts):
    df_c = Counter()
    for t in texts:
        df_c.update(set(tokenize(t)))
    return ray.data.from_items(
        [{"term": t, "df": c} for t, c in sorted(df_c.items())]
    )


def _local_score(tokens, texts):
    """Independent Laplace replay from pure-Python Counters, same
    left-to-right accumulation order."""
    uni, big = Counter(), Counter()
    for t in texts:
        ts = tokenize(t)
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    n = np.float64(sum(uni.values()))
    v = np.float64(len(uni))
    total = np.float64(np.log((uni.get(tokens[0], 0) + 1.0) / (n + v)))
    for a, b in zip(tokens, tokens[1:]):
        total = total + np.float64(
            np.log((big.get((a, b), 0) + 1.0) / (uni.get(a, 0) + v))
        )
    return float(total)


def _local_suggest(texts, queries, max_edits, per_token, topn):
    df_c = Counter()
    for t in texts:
        df_c.update(set(tokenize(t)))
    out = []
    for qid, qtext in queries:
        ts = tokenize(qtext)
        phrases = {" ".join(ts)}
        for i, tok in enumerate(ts):
            cands = sorted(
                (
                    (levenshtein(tok, w), -c, w)
                    for w, c in df_c.items()
                    if levenshtein(tok, w) <= max_edits
                ),
            )[:per_token]
            for _, _, w in cands:
                if w != tok:
                    phrases.add(" ".join(ts[:i] + [w] + ts[i + 1:]))
        scored = sorted(
            ((_local_score(p.split(" "), texts), p) for p in phrases),
            key=lambda sp: (-sp[0], sp[1]),
        )[:topn]
        for r, (s, p) in enumerate(scored):
            out.append((qid, r, p, s))
    return out


CORPUS = (
    ["bad weather today"] * 5
    + ["bad luck again"] * 4
    + ["bat cave entrance"] * 2
    + ["the bat flew home"] * 2
    + ["green tea leaves"] * 3
)


def test_matches_local_replay():
    texts = CORPUS
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    queries = [(0, "bac cave"), (1, "bad weather"), (2, "gren tea leaves")]
    got = phrase_suggest(
        _dict_ds(texts), docs, queries, max_edits=1, per_token=3, topn=3
    ).to_pandas()
    want = pd.DataFrame(
        _local_suggest(texts, queries, 1, 3, 3),
        columns=["query_id", "rank", "phrase", "score"],
    )
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(got["phrase"]) == list(want["phrase"])
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_context_beats_df():
    """'bac cave': df(bad) > df(bat), but the bigram (bat, cave) is
    attested and (bad, cave) is not — the LM must pick 'bat cave'."""
    texts = CORPUS
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    got = phrase_suggest(
        _dict_ds(texts), docs, [(0, "bac cave")],
        max_edits=1, per_token=3, topn=3,
    ).to_pandas()
    assert got.loc[got["rank"] == 0, "phrase"].iloc[0] == "bat cave"
    phrases = set(got["phrase"])
    assert "bad cave" in phrases or "bac cave" in phrases  # alternatives exist
    # non-vacuity of the setup: bad really is more frequent than bat
    df_c = Counter()
    for t in texts:
        df_c.update(set(tokenize(t)))
    assert df_c["bad"] > df_c["bat"]


def test_correct_phrase_ranks_first_and_is_included():
    texts = CORPUS
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    model = train_bigram_counts(docs)
    got = phrase_suggest(
        _dict_ds(texts), docs, [(0, "bad weather")],
        max_edits=1, per_token=3, topn=3, model=model,
    ).to_pandas()
    assert got.loc[got["rank"] == 0, "phrase"].iloc[0] == "bad weather"
    # and its score is the direct laplace score of the phrase
    s0 = float(got.loc[got["rank"] == 0, "score"].iloc[0])
    assert s0 == laplace_phrase_score(["bad", "weather"], model)


def test_unknown_token_and_contracts():
    texts = CORPUS
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    # a token with no candidate within 1 edit stays itself (OOV scored
    # with zero counts)
    got = phrase_suggest(
        _dict_ds(texts), docs, [(0, "zzzqqq cave")],
        max_edits=1, per_token=3, topn=2,
    ).to_pandas()
    assert all(p.startswith("zzzqqq ") for p in got["phrase"])
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        phrase_suggest(_dict_ds(texts), docs, [(0, "!!!")])
    with pytest.raises(ValueError, match="topn"):
        phrase_suggest(_dict_ds(texts), docs, [(0, "bad")], topn=0)
