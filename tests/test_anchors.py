"""Anchor-text retrieval: the derived anchor corpus must match a local
derivation exactly (doc set + per-doc token multiset), and searching
the index built over it must be rank- and score-identical to the local
brute-force BM25 oracle over the same derived corpus."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.anchors import anchor_pages
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.graph import synth_edges
from mini_ivf_ray.pipelines.query import brute_force_topk, search

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "web data index shard merge"),
    (2, "alpha web crawl frontier"),
    (3, ""),  # tokenless: contributes no anchors
    (4, "query spill encode decode"),
    (5, "beta data alpha web page"),
    (6, "merge sort heap stack"),
]


def _docs_ds():
    ids = np.array([d for d, _ in DOCS], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ids,
                "text": pa.array([t for _, t in DOCS], type=pa.string()),
            }
        )
    )


def _local_anchor_corpus(edges, k=4):
    """dict dst -> list of anchor tokens (multiset), mirroring
    anchor_pages semantics: each in-edge contributes the source's
    first-k tokens; sources with zero tokens contribute nothing."""
    first_k = {d: tokenize(t)[:k] for d, t in DOCS}
    corpus: dict[int, list[str]] = {}
    for s, d in edges:
        toks = first_k[int(s)]
        if toks:
            corpus.setdefault(int(d), []).extend(toks)
    return corpus


def test_anchor_corpus_matches_local_derivation():
    docs = _docs_ds()
    edges_ds = synth_edges(docs.select_columns(["doc_id"]), max_deg=3)
    edges_ds = edges_ds.materialize()
    e = edges_ds.to_pandas()
    pages = anchor_pages(docs, edges_ds, k_tokens=4).to_pandas()
    want = _local_anchor_corpus(zip(e["src"], e["dst"]))
    assert set(pages["doc_id"].astype(int)) == set(want)
    for _, row in pages.iterrows():
        got = sorted(tokenize(row["text"]))
        assert got == sorted(want[int(row["doc_id"])]), row["doc_id"]


def test_anchor_search_rank_identical_to_local_oracle(tmp_path):
    cfg = PipelineConfig(num_partitions=4, topk=10, doc_id_from_url=False)
    docs = _docs_ds()
    edges_ds = synth_edges(docs.select_columns(["doc_id"]), max_deg=3)
    edges_ds = edges_ds.materialize()
    e = edges_ds.to_pandas()

    idx = str(tmp_path / "anchor_idx")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(
        lambda: anchor_pages(_docs_ds(), edges_ds, k_tokens=4),
        idx, cfg, dedup=False,
    )

    corpus = _local_anchor_corpus(zip(e["src"], e["dst"]))
    oracle_docs = pd.DataFrame(
        {
            "doc_id": np.array(sorted(corpus), dtype=np.uint64),
            "text": [" ".join(corpus[d]) for d in sorted(corpus)],
        }
    )
    queries = [(0, "alpha web"), (1, "data merge"), (2, "nosuchterm")]
    want = brute_force_topk(oracle_docs, queries, cfg).sort_values(
        ["query_id", "rank"]
    )
    qds = ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in queries]
    )
    got = search(idx, qds, cfg).to_pandas().sort_values(["query_id", "rank"])
    assert np.array_equal(
        got["doc_id"].to_numpy().astype(np.uint64),
        want["doc_id"].to_numpy().astype(np.uint64),
    )
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_anchor_pages_drop_tokenless_only_linked_docs():
    """A page whose ONLY in-links come from tokenless sources is absent
    from the anchor corpus (matching the SQL oracle's unnest-of-empty
    semantics)."""
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                "text": pa.array(["", "linked only by empty", "real text"]),
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([0, 2], dtype=np.int64),
                "dst": np.array([1, 0], dtype=np.int64),
            }
        )
    )
    pages = anchor_pages(docs, edges, k_tokens=4).to_pandas()
    assert set(pages["doc_id"].astype(int)) == {0}
    assert sorted(tokenize(pages["text"].iloc[0])) == ["real", "text"]
