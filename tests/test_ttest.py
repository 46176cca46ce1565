"""T-test aggregation (ES t_test): local replay identity for both
modes, guard rules (small side / zero variance), overlap semantics,
derived-kernel cross-check against direct formulas, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.ttest import (
    TTEST_COLUMNS,
    derived_ttest,
    t_test_search,
)

QUERIES = [(0, "the data web"), (1, "w00042 of"), (2, "a data")]


def _field(docs):
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    v = np.array([float(len(t)) for t in docs["text"]], dtype=np.float64)
    return ids, v


def _match_ids(docs, qtext):
    terms = set(tokenize(qtext))
    return {
        int(d)
        for d, t in zip(docs["doc_id"], docs["text"])
        if terms & set(tokenize(t))
    }


def _side_ids(docs, term):
    return {
        int(d)
        for d, t in zip(docs["doc_id"], docs["text"])
        if term in set(tokenize(t))
    }


def _run(idx, cfg, docs, a, b, mode="heteroscedastic", queries=QUERIES):
    import pandas as pd

    ids, v = _field(docs)
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    df = t_test_search(idx, qds, ids, v, a, b, mode=mode, cfg=cfg).to_pandas()
    if not len(df):
        return pd.DataFrame(columns=TTEST_COLUMNS)
    return df.sort_values("query_id").reset_index(drop=True)


def _local(docs, qtext, a, b, mode):
    ids, v = _field(docs)
    vmap = dict(zip(ids.tolist(), v.tolist()))
    m = _match_ids(docs, qtext)
    sides = []
    for term in (a, b):
        sel = sorted(m & _side_ids(docs, term))
        vv = np.array([vmap[d] for d in sel])
        sides.append(
            (len(sel), float(np.sum(vv)), float(np.sum(vv * vv)))
        )
    return derived_ttest(*sides[0], *sides[1], mode)


def test_ttest_matches_local_replay_both_modes(tiny_index):
    idx, cfg, docs = tiny_index
    for mode in ("heteroscedastic", "homoscedastic"):
        got = _run(idx, cfg, docs, "data", "web", mode=mode)
        assert len(got) == len(QUERIES)
        for qid, qtext in QUERIES:
            want = _local(docs, qtext, "data", "web", mode)
            row = got[got["query_id"] == qid].iloc[0]
            assert (row["mean_a"], row["mean_b"], row["t"], row["df"]) == want
        # the statistic is non-degenerate somewhere
        assert (got["t"] != 0.0).any()
    # the two modes genuinely differ (Welch df is fractional)
    w = _run(idx, cfg, docs, "data", "web", mode="heteroscedastic")
    p = _run(idx, cfg, docs, "data", "web", mode="homoscedastic")
    assert not np.array_equal(w["df"].to_numpy(), p["df"].to_numpy())


def test_ttest_derived_kernel_vs_direct_formula():
    rng = np.random.default_rng(5)
    for _ in range(50):
        a = rng.integers(0, 300, size=int(rng.integers(2, 40))).astype(float)
        b = rng.integers(0, 300, size=int(rng.integers(2, 40))).astype(float)
        got = derived_ttest(
            len(a), a.sum(), (a * a).sum(),
            len(b), b.sum(), (b * b).sum(),
            "heteroscedastic",
        )
        va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
        if va / len(a) + vb / len(b) <= 0:
            assert got is None
            continue
        t = (a.mean() - b.mean()) / np.sqrt(va / len(a) + vb / len(b))
        df = (va / len(a) + vb / len(b)) ** 2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert got[2] == pytest.approx(t, rel=1e-12)
        assert got[3] == pytest.approx(df, rel=1e-12)


def test_ttest_guards_and_overlap():
    # side too small: no result
    assert derived_ttest(1, 5.0, 25.0, 4, 10.0, 30.0, "heteroscedastic") is None
    # both sides constant: zero denominator, no result
    assert (
        derived_ttest(3, 15.0, 75.0, 3, 15.0, 75.0, "heteroscedastic") is None
    )
    # overlapping filters double-count the shared doc by design:
    # identical filters give t == 0 with na == nb
    d = derived_ttest(5, 50.0, 520.0, 5, 50.0, 520.0, "homoscedastic")
    assert d is not None and d[2] == 0.0


def test_ttest_oov_filter_and_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    ids, v = _field(docs)
    # an OOV side has n == 0 everywhere -> no rows at all
    got = _run(idx, cfg, docs, "data", "zzqq9999xx")
    assert len(got) == 0
    qds = ray.data.from_items([{"query_id": 0, "text": "the"}])
    with pytest.raises(ValueError, match="mode"):
        t_test_search(idx, qds, ids, v, "a", "b", mode="paired", cfg=cfg)
    with pytest.raises(ValueError, match="NaN"):
        bad = v.copy()
        bad[0] = np.nan
        t_test_search(idx, qds, ids, bad, "a", "b", cfg=cfg)
