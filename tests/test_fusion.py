"""linear/minmax fusion (ES linear retriever): normalization rule,
degenerate lists, absent-doc zeros, weight contract, RRF contrast."""

import numpy as np
import pandas as pd
import pytest

from mini_ivf_ray.pipelines.fusion import linear_fuse, minmax_normalize


def _df(rows, score_col="score"):
    return pd.DataFrame(rows, columns=["query_id", "doc_id", score_col])


def test_minmax_normalization_exact():
    df = _df([(0, 1, 10.0), (0, 2, 5.0), (0, 3, 0.0), (1, 7, 4.0),
              (1, 8, 2.0)])
    n = minmax_normalize(df, "score").to_numpy()
    assert np.array_equal(n, np.array([1.0, 0.5, 0.0, 1.0, 0.0]))


def test_all_equal_and_singleton_lists_normalize_to_one():
    df = _df([(0, 1, 3.0), (0, 2, 3.0), (1, 9, 42.0)])
    n = minmax_normalize(df, "score").to_numpy()
    assert np.array_equal(n, np.ones(3))


def test_fuse_weights_and_absent_docs():
    lex = _df([(0, 1, 10.0), (0, 2, 0.0)])
    sem = _df([(0, 2, 1.0), (0, 3, 0.5), (0, 4, 0.0)], "cos")
    out = linear_fuse([(lex, "score", 0.75), (sem, "cos", 0.25)], topk=10)
    got = dict(zip(out["doc_id"], out["score"]))
    # doc1: lex-only 0.75*1.0; doc2: 0.75*0 + 0.25*1; doc3: 0.25*0.5;
    # doc4: retrieved-but-minimum -> 0.0 contribution, still emitted
    assert got == {1: 0.75, 2: 0.25, 3: 0.125, 4: 0.0}
    assert out.loc[out["rank"] == 0, "doc_id"].iloc[0] == 1


def test_tie_break_doc_asc_and_topk_cut():
    lex = _df([(0, 5, 1.0), (0, 3, 1.0), (0, 9, 0.0)])
    out = linear_fuse([(lex, "score", 1.0)], topk=2)
    assert out["doc_id"].tolist() == [3, 5]
    assert out["rank"].tolist() == [0, 1]


def test_negative_weight_rejected():
    with pytest.raises(ValueError, match=">= 0"):
        linear_fuse([(_df([(0, 1, 1.0)]), "score", -0.1)], topk=5)


def test_diverges_from_rrf_when_scores_are_skewed():
    """Two systems, same ranks, very different score GAPS: linear
    fusion must be able to order docs differently than rank-only RRF
    (the reason the retriever exists)."""
    lex = _df([(0, 1, 100.0), (0, 2, 99.9), (0, 3, 0.0)])
    sem = _df([(0, 3, 1.0), (0, 2, 0.99), (0, 1, 0.0)], "cos")
    out = linear_fuse([(lex, "score", 0.5), (sem, "cos", 0.5)], topk=3)
    # doc2 is ~max in BOTH lists (norm ~0.999 each) and must beat
    # doc1/doc3 (each 0.5) — while RRF over ranks would put doc2
    # second-equal, never first
    assert out.loc[out["rank"] == 0, "doc_id"].iloc[0] == 2
