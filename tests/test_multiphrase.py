"""Multi-phrase search (Lucene MultiPhraseQuery): index-only ==
corpus-verify == brute-force local oracle at untruncated top-k,
singleton-slot degeneracy to exact phrase, 1-slot degeneracy to plain
disjunction, alternatives provably widening the match set, kernel and
contract units."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.multiphrase import (
    contains_multi_phrase,
    multi_phrase_topk,
    normalize_slots,
)

QUERIES = [
    (0, [["the"], ["data", "web"]]),
    (1, [["data"], ["of", "w00042"]]),
    (2, [["the", "a"], ["data"], ["web", "of"]]),
    (3, [["zzqq"], ["data"]]),  # OOV slot: empty result
]


@pytest.fixture(scope="module")
def mp_index(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.positions import build_positions
    from mini_ivf_ray.stages.prepare import prepare_documents
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(400, seed=31, vocab_size=300)
    idx = str(tmp_path_factory.mktemp("mpidx") / "idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    build_positions(idx, ray.data.from_pandas(docs[["doc_id", "text"]]), cfg)
    return idx, cfg, docs


def _canon(df):
    df = df.copy()
    if len(df):
        df["doc_id"] = df["doc_id"].astype("uint64")
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _brute(docs, idx, queries, topk):
    """Token-stream walk + disjunctive union-term BM25 rank."""
    from mini_ivf_ray.functions import bm25
    from mini_ivf_ray.state.stats import CorpusStats

    stats = CorpusStats.load(idx)
    toks = [tokenize(t) for t in docs["text"]]
    ids = docs["doc_id"].to_numpy().astype(np.uint64)
    rows = []
    for qid, slots in queries:
        slots = normalize_slots(slots)
        union = sorted({t for s in slots for t in s})
        cands = []
        for i, tk in enumerate(toks):
            if not contains_multi_phrase(tk, slots):
                continue
            s = 0.0
            dl = float(len(tk))
            for t in union:
                tf = float(tk.count(t))
                if tf > 0 and stats.df.get(t, 0) > 0:
                    s += float(
                        bm25.contributions(
                            np.array([tf]), np.array([dl]),
                            stats.df[t], stats.n_docs, stats.avgdl,
                        )[0]
                    )
            cands.append((int(ids[i]), s))
        cands.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(cands[:topk]):
            rows.append((qid, r, d, s))
    import pandas as pd

    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_index_corpus_brute_identity(mp_index):
    idx, cfg, docs = mp_index
    big = PipelineConfig(**{**cfg.__dict__, "topk": 10_000})
    docs_ds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_index = _canon(
        multi_phrase_topk(idx, None, QUERIES, big, positions="index")
    )
    via_corpus = _canon(
        multi_phrase_topk(idx, docs_ds, QUERIES, big, positions="corpus")
    )
    brute = _canon(_brute(docs, idx, QUERIES, big.topk))
    assert len(via_index) == len(via_corpus) == len(brute) > 0
    for other, tag in ((via_corpus, "corpus"), (brute, "brute")):
        assert np.array_equal(
            via_index["doc_id"].to_numpy(), other["doc_id"].to_numpy()
        ), tag
        assert np.allclose(
            via_index["score"].to_numpy(), other["score"].to_numpy(),
            rtol=0, atol=1e-9,
        ), tag
    # the OOV slot emptied its query on every backend
    assert 3 not in set(via_index["query_id"])


def test_singleton_slots_degenerate_to_phrase(mp_index):
    """Every slot a single alternative == phrase_topk bit-identically
    (same verified docs, same conjunctive == disjunctive score)."""
    from mini_ivf_ray.pipelines.phrase import phrase_topk

    idx, cfg, docs = mp_index
    mp = _canon(
        multi_phrase_topk(
            idx, None, [(0, [["the"], ["data"]])], cfg, positions="index"
        )
    )
    ph = _canon(
        phrase_topk(idx, None, [(0, "the data")], cfg, positions="index")
    )
    assert len(mp) == len(ph) > 0
    assert np.array_equal(mp["doc_id"].to_numpy(), ph["doc_id"].to_numpy())
    assert np.array_equal(mp["score"].to_numpy(), ph["score"].to_numpy())


def test_one_slot_degenerates_to_disjunction(mp_index):
    """[[t1, t2]] == plain disjunctive search('t1 t2') bit-identically
    (every occurrence is a 1-phrase; no position check runs)."""
    from mini_ivf_ray.pipelines.query import search

    idx, cfg, docs = mp_index
    mp = _canon(
        multi_phrase_topk(
            idx, None, [(0, [["data", "web"]])], cfg, positions="index"
        )
    )
    qds = ray.data.from_items([{"query_id": 0, "text": "data web"}])
    plain = _canon(search(idx, qds, cfg).to_pandas())
    assert len(mp) == len(plain) > 0
    assert np.array_equal(mp["doc_id"].to_numpy(), plain["doc_id"].to_numpy())
    assert np.array_equal(mp["score"].to_numpy(), plain["score"].to_numpy())


def test_alternatives_widen_the_match_set(mp_index):
    """The multi-phrase match set is a strict superset of each
    single-alternative phrase's match set (untruncated top-k)."""
    from mini_ivf_ray.pipelines.phrase import phrase_topk

    idx, cfg, docs = mp_index
    big = PipelineConfig(**{**cfg.__dict__, "topk": 10_000})
    mp = multi_phrase_topk(
        idx, None, [(0, [["the"], ["data", "web"]])], big, positions="index"
    )
    mp_set = set(map(int, mp["doc_id"]))
    singles = []
    for v in ("data", "web"):
        ph = phrase_topk(idx, None, [(0, f"the {v}")], big, positions="index")
        singles.append(set(map(int, ph["doc_id"])))
    assert mp_set == singles[0] | singles[1]
    for s in singles:
        assert s < mp_set  # strict: each variant alone misses docs


def test_kernel_and_contracts():
    assert contains_multi_phrase(
        ["x", "big", "data", "y"], [["big"], ["data", "dataset"]]
    )
    assert contains_multi_phrase(
        ["x", "big", "dataset"], [["big"], ["data", "dataset"]]
    )
    assert not contains_multi_phrase(
        ["big", "x", "data"], [["big"], ["data"]]
    )
    assert not contains_multi_phrase(["big"], [["big"], ["data"]])
    # slot window at the very end of the stream
    assert contains_multi_phrase(["a", "b"], [["a"], ["b"]])
    with pytest.raises(ValueError, match="slot"):
        normalize_slots([["ok"], []])
    with pytest.raises(ValueError, match=">= 1 slot"):
        normalize_slots([])
    with pytest.raises(ValueError, match="one term"):
        normalize_slots([["two words"]])
    # duplicate alternatives collapse; normalization lowercases
    assert normalize_slots([["Data", "data"]]) == [["data"]]
