"""Match-phrase-prefix (ES match_phrase_prefix): index-only ==
corpus-verify == brute-force local oracle, the max_expansions cap
bite, expansion-rule and kernel unit tests, contracts."""

import numpy as np
import pytest

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.phraseprefix import (
    contains_prefix_phrase,
    expand_prefix,
    match_phrase_prefix_topk,
)

QUERIES = [
    (0, "the w0"),        # fixed [the], prefix w0 — many expansions
    (1, "data w0"),
    (2, "the data w"),    # 2 fixed tokens
    (3, "the zzqq"),      # no dictionary term with this prefix
]


@pytest.fixture(scope="module")
def pp_index(tmp_path_factory):
    from mini_ivf_ray.pipelines.build import build_index
    from mini_ivf_ray.pipelines.positions import build_positions
    from mini_ivf_ray.stages.prepare import prepare_documents
    from mini_ivf_ray.sources.pages import generate_pages

    cfg = PipelineConfig(num_partitions=3, topk=10)
    tbl = generate_pages(400, seed=29, vocab_size=300)
    idx = str(tmp_path_factory.mktemp("ppidx") / "idx")
    build_index(lambda: ray.data.from_arrow(tbl), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(tbl), cfg).to_pandas()
    build_positions(idx, ray.data.from_pandas(docs[["doc_id", "text"]]), cfg)
    return idx, cfg, docs


def _canon(df):
    df = df.copy()
    if len(df):
        df["doc_id"] = df["doc_id"].astype("uint64")
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _brute(docs, queries, max_exp, topk):
    """Token-stream + capped-expansion local oracle (no index)."""
    from mini_ivf_ray.functions import bm25 as bm25f

    toks = {int(d): tokenize(t) for d, t in zip(docs["doc_id"], docs["text"])}
    dictionary = sorted({t for tl in toks.values() for t in tl})
    rows = []
    for qid, text in queries:
        q = tokenize(text)
        fixed, prefix = q[:-1], q[-1]
        exps = set(expand_prefix(dictionary, prefix, max_exp))
        hits = [
            d
            for d, tl in toks.items()
            if contains_prefix_phrase(tl, fixed, exps)
        ]
        rows.extend((qid, d) for d in hits)
    return rows


def test_index_equals_corpus_equals_brute(pp_index):
    import dataclasses

    idx, cfg, docs = pp_index
    cfg = dataclasses.replace(cfg, topk=10_000)  # no truncation
    dds = ray.data.from_pandas(docs[["doc_id", "text"]])
    via_corpus = _canon(
        match_phrase_prefix_topk(
            idx, dds, QUERIES, cfg, max_expansions=4, positions="corpus"
        )
    )
    # docs_ds=None proves the index path never reads document text
    via_index = _canon(
        match_phrase_prefix_topk(
            idx, None, QUERIES, cfg, max_expansions=4, positions="index"
        )
    )
    assert via_corpus.to_dict("list") == via_index.to_dict("list")
    # match SETS equal the brute-force oracle (topk may truncate, so
    # compare within rank coverage: every brute hit set's top-10)
    brute = set(_brute(docs, QUERIES, 4, cfg.topk))
    got_pairs = set(
        zip(via_index["query_id"].tolist(), via_index["doc_id"].tolist())
    )
    assert got_pairs == brute
    # OOV prefix (q3) emits nothing
    assert 3 not in via_index["query_id"].tolist()
    assert len(via_index)


def test_expansion_cap_bites(pp_index):
    import dataclasses

    idx, cfg, docs = pp_index
    cfg = dataclasses.replace(cfg, topk=10_000)  # no truncation
    uncapped = _canon(
        match_phrase_prefix_topk(
            idx, None, QUERIES[:2], cfg, max_expansions=500,
            positions="index",
        )
    )
    capped = _canon(
        match_phrase_prefix_topk(
            idx, None, QUERIES[:2], cfg, max_expansions=1,
            positions="index",
        )
    )
    # w0* expands to hundreds of vocab terms: one-expansion matching
    # must be a strict subset somewhere
    assert len(capped) < len(uncapped)
    cap_pairs = set(zip(capped["query_id"], capped["doc_id"]))
    un_pairs = set(zip(uncapped["query_id"], uncapped["doc_id"]))
    assert cap_pairs < un_pairs


def test_expand_prefix_rule():
    d = ["scan", "slow", "small", "sort", "spark", "stream", "table"]
    assert expand_prefix(d, "s", 3) == ["scan", "slow", "small"]
    assert expand_prefix(d, "s", 99) == d[:-1]
    assert expand_prefix(d, "sm", 5) == ["small"]
    assert expand_prefix(d, "zz", 5) == []
    with pytest.raises(ValueError, match="prefix"):
        expand_prefix(d, "", 3)
    with pytest.raises(ValueError, match="max_expansions"):
        expand_prefix(d, "s", 0)


def test_kernel_and_contracts(pp_index):
    idx, cfg, _ = pp_index
    assert contains_prefix_phrase(
        ["a", "b", "see", "d"], ["a", "b"], {"sea", "see"}
    )
    assert not contains_prefix_phrase(
        ["a", "x", "see"], ["a", "b"], {"see"}
    )
    assert not contains_prefix_phrase(
        ["a", "b"], ["a", "b"], {"see"}
    )  # nothing after the fixed chain
    with pytest.raises(ValueError, match="fixed token"):
        match_phrase_prefix_topk(idx, None, [(0, "solo")], cfg)
