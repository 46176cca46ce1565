"""MMR diversity rerank properties."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.pipelines.rerank import (
    fetch_vectors,
    mmr_rerank_results,
    mmr_select,
)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def test_mmr_demotes_duplicates():
    # doc 1 and 2: identical vectors, both high relevance; doc 3:
    # orthogonal, lower relevance.  Plain ranking: [1, 2, 3]; MMR must
    # interleave the diverse doc: [1, 3, 2].
    ids = np.array([1, 2, 3])
    scores = np.array([10.0, 9.9, 5.0])
    V = np.stack([_unit([1, 0]), _unit([1, 0]), _unit([0, 1])])
    assert mmr_select(ids, scores, V, k=3, lam=0.5) == [1, 3, 2]
    # lam=1.0 degenerates to pure relevance order
    assert mmr_select(ids, scores, V, k=3, lam=1.0) == [1, 2, 3]
    # first pick is always the relevance argmax
    assert mmr_select(ids, scores, V, k=1, lam=0.3) == [1]
    # tie on the first pick -> doc_id asc
    assert mmr_select(
        np.array([7, 4]), np.array([1.0, 1.0]),
        np.stack([_unit([1, 0]), _unit([0, 1])]), k=1,
    ) == [4]


def test_mmr_rerank_results_end_to_end():
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "embedding": [
                [1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.7, 0.7],
            ],
        }
    )
    results = pd.DataFrame(
        {
            "query_id": [0, 0, 0, 1],
            "doc_id": [1, 2, 3, 4],
            "score": [10.0, 9.9, 5.0, 3.0],
        }
    )
    out = mmr_rerank_results(
        results, ray.data.from_arrow(emb), k=3, lam=0.5
    )
    g0 = out[out.query_id == 0]
    assert list(g0["doc_id"]) == [1, 3, 2]
    assert list(g0["rank"]) == [0, 1, 2]
    assert list(out[out.query_id == 1]["doc_id"]) == [4]
    # fetch_vectors returns normalized rows aligned to sorted ids
    ids, V = fetch_vectors(ray.data.from_arrow(emb), [3, 1])
    assert list(ids) == [1, 3]
    np.testing.assert_allclose(np.linalg.norm(V, axis=1), 1.0)
