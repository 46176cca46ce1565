"""More-like-this: mining determinism + self-exclusion + identity."""

import numpy as np

import ray.data
from mini_ivf_ray.functions import bm25
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.mlt import mine_seed_terms, more_like_this
from mini_ivf_ray.pipelines.query import brute_force_topk
from mini_ivf_ray.state.stats import CorpusStats


def test_mined_terms_match_local_ranking(tiny_index):
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    seeds = [int(docs["doc_id"].iloc[0]), int(docs["doc_id"].iloc[7])]
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(7)
    got = mine_seed_terms(docs_ds, seeds, stats, n_terms=5)
    for seed in seeds:
        text = docs.loc[docs["doc_id"] == seed, "text"].iloc[0]
        tf: dict[str, int] = {}
        for t in tokenize(text):
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            (
                (-tf[t] * bm25.idf(stats.df[t], stats.n_docs), t)
                for t in tf
                if stats.df.get(t, 0) > 0
            ),
        )[:5]
        assert got[seed] == [t for _, t in scored], seed


def test_results_exclude_seed_and_match_bruteforce(tiny_index):
    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    seeds = [int(docs["doc_id"].iloc[3]), int(docs["doc_id"].iloc[11])]
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = more_like_this(idx, docs_ds, seeds, cfg, n_terms=5)
    assert len(res)
    mined = mine_seed_terms(docs_ds, seeds, stats, n_terms=5)
    queries = [(s, " ".join(mined[s])) for s in seeds]
    import dataclasses

    wide = dataclasses.replace(cfg, topk=cfg.topk + 1)
    oracle = brute_force_topk(docs, queries, wide)
    for seed in seeds:
        sub = res[res["seed_id"] == seed]
        assert not (sub["doc_id"].astype(np.uint64) == np.uint64(seed)).any()
        o = oracle[oracle["query_id"] == seed].sort_values("rank")
        want = [
            (int(d), float(s))
            for d, s in zip(o["doc_id"], o["score"])
            if int(d) != seed
        ][: cfg.topk]
        srt = sub.sort_values("rank")
        got = [
            (int(d), float(s))
            for d, s in zip(srt["doc_id"].to_numpy(), srt["score"])
        ]
        assert [d for d, _ in got] == [d for d, _ in want], seed
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == ws, (seed, gd)


def test_unknown_seed_is_empty(tiny_index):
    idx, cfg, docs = tiny_index
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    res = more_like_this(idx, docs_ds, [10_000_000], cfg)
    assert len(res) == 0


def test_unlike_excludes_and_refills(tiny_index):
    """unlike: the unlike doc's vocabulary vanishes from the mined
    sets, the head REFILLS to n_terms when candidates remain, and an
    all-excluded seed emits nothing."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.mlt import (
        mine_seed_terms,
        more_like_this,
    )
    from mini_ivf_ray.state.stats import CorpusStats

    idx, cfg, docs = tiny_index
    stats = CorpusStats.load(idx)
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    seed, unlike = int(ids[0]), int(ids[1])
    base = mine_seed_terms(dds, [seed], stats, n_terms=5)[seed]
    unlike_vocab = set(
        tokenize(docs.loc[docs["doc_id"] == unlike, "text"].iloc[0])
    )
    mined = mine_seed_terms(
        dds, [seed], stats, n_terms=5, exclude=unlike_vocab
    )[seed]
    assert not (set(mined) & unlike_vocab)
    # refilling: still 5 terms as long as the seed has >= 5 candidates
    seed_vocab = {
        t
        for t in tokenize(docs.loc[docs["doc_id"] == seed, "text"].iloc[0])
        if stats.df.get(t, 0) > 0 and t not in unlike_vocab
    }
    assert len(mined) == min(5, len(seed_vocab))
    if set(base) & unlike_vocab:
        assert mined != base  # the exclusion provably reshaped the head
    # end-to-end: all-excluded seed emits no rows
    res = more_like_this(
        idx, dds, [seed], cfg, n_terms=5, unlike_ids=[seed]
    )
    assert len(res) == 0
