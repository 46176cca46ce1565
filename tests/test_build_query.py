"""E2E build -> query rank-identity (reference analog: the randomized
self-contained e2e of test_ivf.cpp:26-111, strengthened from recall@k to
rank-identity per north_rule) + structural index checks."""

import json
import os

import numpy as np
import pyarrow.parquet as pq

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.query import (
    BM25Searcher,
    brute_force_topk,
    exhaustive_topk,
    search,
)
from mini_ivf_ray.state.stats import CorpusStats


def _mk_queries(docs, rng, nq=40):
    """Head + tail + OOV mixed queries from the corpus vocabulary."""
    vocab = sorted({t for text in docs["text"] for t in tokenize(text)})
    qs = []
    for qid in range(nq):
        k = rng.integers(1, 6)
        terms = list(rng.choice(vocab, size=k))
        if qid % 7 == 0:
            terms.append("zzoutofvocabzz")
        qs.append((qid, " ".join(terms)))
    return qs


def test_rank_identity_wand_vs_oracle(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(3)
    queries = _mk_queries(docs, rng)
    oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    res = search(idx, qds, cfg).to_pandas().sort_values(["query_id", "rank"])
    assert len(res) == len(oracle)
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    # scores bit-identical (same float64 accumulation order)
    np.testing.assert_array_equal(res["score"].to_numpy(), oracle["score"].to_numpy())


def test_exhaustive_distributed_matches_local(tiny_index):
    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(5)
    queries = _mk_queries(docs, rng, nq=10)
    stats = CorpusStats.load(idx)
    local = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    dist = exhaustive_topk(
        ray.data.from_pandas(docs), stats, queries, cfg
    ).sort_values(["query_id", "rank"])
    np.testing.assert_array_equal(
        local["doc_id"].to_numpy().astype(np.uint64),
        dist["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(local["score"].to_numpy(), dist["score"].to_numpy())


def test_index_structure(tiny_index):
    idx, cfg, docs = tiny_index
    with open(os.path.join(idx, "manifest.json")) as f:
        meta = json.load(f)
    assert meta["n_docs"] == len(docs)
    assert meta["counters"]["n_postings"] > 0
    # posting invariants per partition: strictly increasing blocks per term
    total_postings = 0
    for part in meta["partitions"]:
        p = part["partition"]
        tbl = pq.read_table(os.path.join(idx, "segments", f"part={p}", "postings.parquet"))
        total_postings += int(np.sum(tbl["count"].to_numpy()))
        terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
        firsts = tbl["first_doc_id"].to_numpy()
        lasts = tbl["last_doc_id"].to_numpy()
        assert np.all(firsts <= lasts)
        # blocks of one term have disjoint increasing ranges
        for t in np.unique(terms):
            m = terms == t
            f_, l_ = firsts[m], lasts[m]
            order = np.argsort(f_)
            assert np.all(f_[order][1:] > l_[order][:-1])
    assert total_postings == meta["counters"]["n_postings"]


def test_stats_consistency(tiny_index):
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    assert stats.n_docs == len(docs)
    # df/cf recomputed from raw docs
    from collections import Counter

    df, cf = Counter(), Counter()
    total = 0
    for text in docs["text"]:
        c = Counter(tokenize(text))
        df.update(c.keys())
        cf.update(c)
        total += sum(c.values())
    assert stats.total_tokens == total
    assert stats.df == dict(df)
    assert stats.cf == dict(cf)


def test_searcher_class_smoke(tiny_index):
    """Actor __init__ exceptions surface late under Ray — smoke the
    class directly (ray_guide pitfall)."""
    idx, cfg, docs = tiny_index
    s = BM25Searcher(idx, cfg)
    res = s.topk_for_text("the data web")
    assert 0 < len(res) <= cfg.topk
    scores = [x[1] for x in res]
    assert scores == sorted(scores, reverse=True)


def test_dedup_last_write_wins(tiny_index):
    idx, cfg, docs = tiny_index
    # generator injected ~4% duplicate urls; post-dedup urls are unique
    assert docs["url"].is_unique
    assert docs["doc_id"].is_unique


def test_taat_and_wand_bit_identical(tiny_index):
    """The TAAT/DAAT cost-model switch must be invisible: forcing WAND
    (taat_threshold=0) and forcing TAAT (huge threshold) give
    bit-identical results, both equal to the oracle."""
    import dataclasses

    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(7)
    queries = _mk_queries(docs, rng, nq=25)
    oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    for thr in (0, 10**9):
        c = dataclasses.replace(cfg, taat_threshold=thr)
        s = BM25Searcher(idx, c)
        rows = []
        for qid, qt in queries:
            for r, (d, sc) in enumerate(s.topk_for_text(qt)):
                rows.append((qid, r, d, sc))
        import pandas as pd

        res = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
        res = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert len(res) == len(oracle)
        np.testing.assert_array_equal(
            res["doc_id"].to_numpy().astype(np.uint64),
            oracle["doc_id"].to_numpy().astype(np.uint64),
        )
        np.testing.assert_array_equal(
            res["score"].to_numpy(), oracle["score"].to_numpy()
        )
        # the forced path actually ran (TAAT splits into full-TAAT +
        # MaxScore sub-paths; both are term-at-a-time, neither is WAND)
        taat_like = s.counters.get("taat_queries", 0) + s.counters.get(
            "maxscore_queries", 0
        )
        if thr == 0:
            assert taat_like == 0
        else:
            assert taat_like == len(queries)


def test_conjunctive_rank_identity(tiny_index):
    """Conjunctive (AND) retrieval: the searcher's mode="and" output is
    rank- and bit-identical to the local conjunctive oracle; results are
    the disjunctive ranking restricted to all-terms docs (same scores);
    any OOV term empties the query."""
    import pandas as pd

    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(11)
    # guaranteed-nonempty AND queries: sample k distinct terms from one
    # doc's own text (that doc matches all of them), plus vocab-random
    # and OOV queries that may legitimately come back empty
    texts = list(docs["text"])
    queries = []
    for qid in range(30):
        if qid % 3 == 2:
            queries.append(_mk_queries(docs, rng, nq=1)[0][1])
            queries[-1] = (qid, queries[-1])
            continue
        toks = sorted(set(tokenize(texts[int(rng.integers(len(texts)))])))
        k = int(rng.integers(1, min(5, len(toks)) + 1))
        queries.append(
            (qid, " ".join(rng.choice(toks, size=k, replace=False)))
        )
    oracle = brute_force_topk(docs, queries, cfg, mode="and").sort_values(
        ["query_id", "rank"]
    )
    assert len(oracle), "conjunctive query set is vacuous — fix the generator"

    s = BM25Searcher(idx, cfg, mode="and")
    rows = [
        (qid, r, d, sc)
        for qid, qt in queries
        for r, (d, sc) in enumerate(s.topk_for_text(qt))
    ]
    res = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    res = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(res) == len(oracle)
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(res["score"].to_numpy(), oracle["score"].to_numpy())
    assert s.counters.get("n_queries", 0) == len(queries)

    # AND ⊆ OR with identical per-(query, doc) scores
    s_or = BM25Searcher(idx, cfg)
    for qid, qt in queries:
        and_hits = dict(s.topk_for_text(qt))
        or_all = dict(s_or.topk_for_text(qt))
        for d, sc in and_hits.items():
            # doc may fall outside OR's top-k only if scores tie-crowd;
            # with k=10 on the tiny corpus every AND hit appears in OR
            if d in or_all:
                assert or_all[d] == sc

    # OOV term -> empty, regardless of other terms
    some_terms = " ".join(sorted(set(tokenize(texts[0])))[:2])
    assert s.topk_for_text(some_terms + " zzoutofvocabzz") == []


def test_phrase_topk_matches_oracle(tiny_index):
    """Phrase search (conjunctive candidates + distributed token-window
    verify) is rank- and bit-identical to the local scan oracle; a
    zero-occurrence phrase and a single-token phrase behave correctly."""
    import ray.data
    from mini_ivf_ray.pipelines.phrase import (
        brute_force_phrase_topk,
        contains_phrase,
        phrase_topk,
    )

    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(13)
    texts = list(docs["text"])
    phrases = []
    for qid in range(12):
        toks = tokenize(texts[int(rng.integers(len(texts)))])
        if len(toks) < 3:
            continue
        i = int(rng.integers(0, len(toks) - 2))
        n = 1 if qid % 5 == 4 else int(rng.integers(2, 4))
        phrases.append((qid, " ".join(toks[i : i + n])))
    phrases.append((98, "zznophrasezz here"))  # OOV term -> empty
    phrases.append((99, texts[0].split()[0] + " zzoutofvocabzz"))

    oracle = brute_force_phrase_topk(docs, phrases, cfg).sort_values(
        ["query_id", "rank"]
    )
    assert len(oracle), "phrase set vacuous"
    res = phrase_topk(
        idx, ray.data.from_pandas(docs), phrases, cfg
    ).sort_values(["query_id", "rank"])
    assert len(res) == len(oracle)
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(res["score"].to_numpy(), oracle["score"].to_numpy())
    # the window matcher itself
    assert contains_phrase(["a", "b", "a", "c"], ["a", "c"])
    assert not contains_phrase(["a", "b", "a", "c"], ["c", "a"])
    assert not contains_phrase(["a"], ["a", "b"])
    assert not contains_phrase(["a", "b"], [])


def test_filtered_search_rank_identity(tiny_index):
    """allowed_docs filtering: exactly the full ranking restricted to
    the whitelist (corpus-wide stats, filter BEFORE the top-k cut),
    scores bit-identical; empty whitelist -> empty; universal
    whitelist == unfiltered (both modes)."""
    import dataclasses

    idx, cfg, docs = tiny_index
    rng = np.random.default_rng(11)
    queries = _mk_queries(docs, rng, nq=25)
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])

    all_ids = docs["doc_id"].to_numpy().astype(np.uint64)
    allowed = all_ids[all_ids % 3 != 0]
    # ground truth: rank the FULL corpus, then filter, then head k —
    # a post-filtered top-k would under-fill, which is the exact bug
    # the filter-before-cut design avoids
    cfg_all = dataclasses.replace(cfg, topk=len(docs))
    full = brute_force_topk(docs, queries, cfg_all)
    exp = (
        full[full["doc_id"].astype(np.uint64).isin(allowed)]
        .sort_values(["query_id", "rank"])
        .groupby("query_id")
        .head(cfg.topk)
        .reset_index(drop=True)
    )
    got = (
        search(idx, qds, cfg, allowed_docs=allowed)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    np.testing.assert_array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        exp["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(got["score"].to_numpy(), exp["score"].to_numpy())
    # per-query rank sequence is 0..n-1
    for _, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(len(g)))

    # empty whitelist -> zero rows, no error
    got_empty = search(
        idx, qds, cfg, allowed_docs=np.empty(0, dtype=np.uint64)
    ).to_pandas()
    assert len(got_empty) == 0

    # universal whitelist == unfiltered, for OR and AND modes
    for mode in ("or", "and"):
        a = (
            search(idx, qds, cfg, mode=mode, allowed_docs=all_ids)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        b = (
            search(idx, qds, cfg, mode=mode)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        np.testing.assert_array_equal(a["doc_id"].to_numpy(), b["doc_id"].to_numpy())
        np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_min_score_floor_is_suffix_cut(tiny_index):
    """ES min_score: filtering the score-desc top-k by score >= t
    removes a pure suffix — dense ranks, and every dropped row ranked
    below every kept row."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.query import search

    idx, cfg, docs = tiny_index
    qds = ray.data.from_items(
        [{"query_id": 0, "text": "the data web"},
         {"query_id": 1, "text": "w00042 of"}]
    )
    res = search(idx, qds, cfg).to_pandas()
    t = float(np.median(res["score"]))
    kept = res[res["score"].to_numpy() >= t]
    assert len(kept) and len(kept) < len(res)  # the floor bites
    for qid, g in kept.groupby("query_id"):
        r = np.sort(g["rank"].to_numpy())
        assert np.array_equal(r, np.arange(r.size)), qid
        dropped = res[(res["query_id"] == qid)
                      & (res["score"].to_numpy() < t)]
        if len(dropped):
            assert dropped["rank"].min() > g["rank"].max()
