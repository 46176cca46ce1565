"""Adversarial rank-identity: corpora engineered for score ties
(duplicate texts -> bit-equal BM25 sums -> tie-break purely on doc_id),
tiny vocabularies, single-token docs.  The reference's randomized
self-contained e2e (test_ivf.cpp:26-111) strengthened to exact ties."""

import numpy as np
import pyarrow as pa

import ray.data
from mini_ivf_ray.config import PipelineConfig
from mini_ivf_ray.functions.extract import wrap_html
from mini_ivf_ray.pipelines.build import build_index
from mini_ivf_ray.pipelines.query import brute_force_topk, search
from mini_ivf_ray.stages.prepare import prepare_documents


def _tie_corpus(seed: int, n: int = 60):
    """Many docs share identical text -> exact score ties."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    base_texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 8))) for _ in range(8)
    ]
    texts = [base_texts[rng.integers(0, len(base_texts))] for _ in range(n)]
    urls = [f"https://t{seed}.example/{i}" for i in range(n)]
    ts = np.full(n, np.datetime64("2024-01-01", "us"))
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(ts),
            "html": pa.array([wrap_html(t) for t in texts], type=pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
        }
    )


def test_tie_heavy_rank_identity(tmp_path):
    for seed in (1, 2, 3):
        cfg = PipelineConfig(num_partitions=3, topk=10, block_size=4)
        pages = _tie_corpus(seed)
        idx = str(tmp_path / f"tie{seed}")
        build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
        docs = prepare_documents(ray.data.from_arrow(pages), cfg).to_pandas()
        queries = [
            (0, "alpha"),
            (1, "alpha beta"),
            (2, "alpha beta gamma delta eps"),
            (3, "eps eps eps"),
            (4, "nosuchterm"),
        ]
        oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
        qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
        res = search(idx, qds, cfg).to_pandas().sort_values(["query_id", "rank"])
        assert len(res) == len(oracle), seed
        np.testing.assert_array_equal(
            res["doc_id"].to_numpy().astype(np.uint64),
            oracle["doc_id"].to_numpy().astype(np.uint64),
        )
        np.testing.assert_array_equal(
            res["score"].to_numpy(), oracle["score"].to_numpy()
        )


def test_single_doc_corpus(tmp_path):
    cfg = PipelineConfig(num_partitions=2, topk=10)
    pages = _tie_corpus(9, n=1)
    idx = str(tmp_path / "one")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(pages), cfg).to_pandas()
    text = docs["text"].iloc[0]
    queries = [(0, text.split()[0])]
    oracle = brute_force_topk(docs, queries, cfg)
    qds = ray.data.from_items([{"query_id": 0, "text": queries[0][1]}])
    res = search(idx, qds, cfg).to_pandas()
    assert len(res) == len(oracle) == 1
    assert res["score"].iloc[0] == oracle["score"].iloc[0]


def test_block_size_one_rank_identity(tmp_path):
    """Degenerate 1-posting blocks: maximal block metadata churn."""
    cfg = PipelineConfig(num_partitions=2, topk=5, block_size=1)
    pages = _tie_corpus(5, n=30)
    idx = str(tmp_path / "b1")
    build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    docs = prepare_documents(ray.data.from_arrow(pages), cfg).to_pandas()
    queries = [(0, "alpha beta"), (1, "gamma")]
    oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
    qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
    res = search(idx, qds, cfg).to_pandas().sort_values(["query_id", "rank"])
    np.testing.assert_array_equal(
        res["doc_id"].to_numpy().astype(np.uint64),
        oracle["doc_id"].to_numpy().astype(np.uint64),
    )
    np.testing.assert_array_equal(res["score"].to_numpy(), oracle["score"].to_numpy())


def test_empty_corpus(tmp_path):
    cfg = PipelineConfig(num_partitions=2, topk=5)
    pages = _tie_corpus(7, n=4).slice(0, 0)  # zero rows, full schema
    idx = str(tmp_path / "empty")
    meta = build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
    assert meta["n_docs"] == 0
    qds = ray.data.from_items([{"query_id": 0, "text": "alpha"}])
    res = search(idx, qds, cfg).to_pandas()
    assert len(res) == 0


def test_tie_heavy_wand_path_rank_identity(tmp_path):
    """The tie corpus with the WAND path FORCED (taat_threshold=0):
    WAND's strict-inequality tie pruning is the delicate part and the
    TAAT default would otherwise shadow it here."""
    import dataclasses

    for seed in (11, 12):
        cfg = PipelineConfig(
            num_partitions=3, topk=10, block_size=4, taat_threshold=0
        )
        pages = _tie_corpus(seed)
        idx = str(tmp_path / f"wtie{seed}")
        build_index(lambda: ray.data.from_arrow(pages), idx, cfg)
        docs = prepare_documents(ray.data.from_arrow(pages), cfg).to_pandas()
        queries = [
            (0, "alpha"),
            (1, "alpha beta"),
            (2, "alpha beta gamma delta eps"),
            (3, "eps eps eps"),
        ]
        oracle = brute_force_topk(docs, queries, cfg).sort_values(["query_id", "rank"])
        qds = ray.data.from_items([{"query_id": q, "text": t} for q, t in queries])
        res = search(idx, qds, cfg).to_pandas().sort_values(["query_id", "rank"])
        assert len(res) == len(oracle), seed
        np.testing.assert_array_equal(
            res["doc_id"].to_numpy().astype(np.uint64),
            oracle["doc_id"].to_numpy().astype(np.uint64),
        )
        np.testing.assert_array_equal(
            res["score"].to_numpy(), oracle["score"].to_numpy()
        )
