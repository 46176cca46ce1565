"""match_bool_prefix: brute-force identity over the replayed
expansion, degeneracies (exact-term prefix == plain search; dead
prefix; single token), cap bite, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.pipelines.boolprefix import match_bool_prefix_topk
from mini_ivf_ray.pipelines.phraseprefix import expand_prefix
from mini_ivf_ray.pipelines.query import brute_force_topk, search
from mini_ivf_ray.stages.merge import load_dictionary


def _vocab(idx):
    return sorted(load_dictionary(idx)["term"].to_pylist())


def test_matches_bruteforce_over_union(tiny_index):
    idx, cfg, docs = tiny_index
    vocab = _vocab(idx)
    queries = [(0, "the w0004"), (1, "data w00"), (2, "w1")]
    res = match_bool_prefix_topk(idx, queries, cfg, max_expansions=5)
    for qid, text in queries:
        toks = text.split()
        fixed, prefix = toks[:-1], toks[-1]
        union = sorted(set(fixed) | set(expand_prefix(vocab, prefix, 5)))
        want = brute_force_topk(
            docs, [(qid, " ".join(union))], cfg
        ).sort_values("rank")
        g = res[res["query_id"] == qid].sort_values("rank")
        assert np.array_equal(
            g["doc_id"].to_numpy().astype(np.uint64),
            want["doc_id"].to_numpy().astype(np.uint64),
        ), (qid, union)
        assert np.array_equal(
            g["score"].to_numpy(), want["score"].to_numpy()
        ), qid


def test_exact_term_prefix_degenerates_to_plain_search(tiny_index):
    """Last token == a vocab term that is the ONLY term under its own
    prefix at cap 1 -> bit-identical to plain disjunctive search."""
    idx, cfg, docs = tiny_index
    vocab = _vocab(idx)
    term = vocab[len(vocab) // 2]
    assert expand_prefix(vocab, term, 1) == [term]
    q = [(0, f"the {term}")]
    a = match_bool_prefix_topk(idx, q, cfg, max_expansions=1)
    qds = ray.data.from_items([{"query_id": 0, "text": f"the {term}"}])
    b = (
        search(idx, qds, cfg)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert np.array_equal(
        a["doc_id"].to_numpy().astype(np.uint64),
        b["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_dead_prefix_leaves_fixed_tokens(tiny_index):
    """A prefix with no expansion == plain search over the fixed
    tokens alone; all-dead query is empty."""
    idx, cfg, docs = tiny_index
    a = match_bool_prefix_topk(idx, [(0, "the zzzz9x")], cfg)
    qds = ray.data.from_items([{"query_id": 0, "text": "the"}])
    b = (
        search(idx, qds, cfg)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert np.array_equal(
        a["doc_id"].to_numpy().astype(np.uint64),
        b["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(a["score"].to_numpy(), b["score"].to_numpy())
    assert len(match_bool_prefix_topk(idx, [(0, "zzzz9x")], cfg)) == 0


def test_cap_bites(tiny_index):
    """Shrinking max_expansions below the prefix's expansion count
    changes (or keeps equal-on-prefix-subset) the reachable docs —
    and the capped expansion is exactly the FIRST-k in term order."""
    idx, cfg, docs = tiny_index
    vocab = _vocab(idx)
    # find a prefix with >= 3 expansions
    from collections import Counter

    c = Counter(t[:2] for t in vocab)
    prefix = sorted(p for p, n in c.items() if n >= 3)[0]
    full = expand_prefix(vocab, prefix, 1000)
    assert expand_prefix(vocab, prefix, 2) == full[:2]
    wide = match_bool_prefix_topk(
        idx, [(0, prefix)], cfg, max_expansions=1000
    )
    narrow = match_bool_prefix_topk(
        idx, [(0, prefix)], cfg, max_expansions=1
    )
    # the narrow result must equal plain search over full[:1]
    qds = ray.data.from_items([{"query_id": 0, "text": full[0]}])
    b = (
        search(idx, qds, cfg)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert np.array_equal(
        narrow["doc_id"].to_numpy().astype(np.uint64),
        b["doc_id"].to_numpy().astype(np.uint64),
    )
    assert len(wide) >= len(narrow)


def test_contracts(tiny_index):
    idx, cfg, docs = tiny_index
    with pytest.raises(ValueError, match="no tokens"):
        match_bool_prefix_topk(idx, [(0, "  ")], cfg)
