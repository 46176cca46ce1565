"""Late-interaction MaxSim retrieval: brute-force replay identity at
untruncated top-k, the self-match lower bound, single-vector
degeneracy, contracts."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.pipelines.colbert import late_interaction_topk, maxsim_local

N, DIM, G = 120, 16, 4


@pytest.fixture(scope="module")
def emb():
    rng = np.random.default_rng(51)
    vals = rng.normal(size=(N, DIM)).astype(np.float32)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(N, dtype=np.int64),
            "embedding": [v for v in vals],
        }
    )
    return df, vals


def test_matches_bruteforce_untruncated(emb):
    df, vals = emb
    ds = ray.data.from_pandas(df)
    qdocs = [0, 5, 17]
    got = late_interaction_topk(
        ds, qdocs, group_size=G, topk=10_000
    ).sort_values(["query_doc", "rank"])
    ref = maxsim_local(vals, df["vec_id"].to_numpy(), qdocs, G)
    n_docs = N // G
    assert len(got) == len(qdocs) * n_docs
    for q in qdocs:
        g = got[got["query_doc"] == q]
        cands = sorted(
            ((d, s) for (qq, d), s in ref.items() if qq == q),
            key=lambda x: (-x[1], x[0]),
        )
        assert [int(d) for d in g["doc"]] == [d for d, _ in cands]
        assert np.allclose(
            g["score"].to_numpy(),
            np.array([s for _, s in cands]),
            rtol=0, atol=1e-9,
        )
        # self-match lower bound: max over own tokens includes the
        # identity, so score(q, q) >= sum of own squared norms
        qmask = df["vec_id"].to_numpy() // G == q
        own = vals[qmask].astype(np.float64)
        self_score = float(
            g[g["doc"] == q]["score"].iloc[0]
        )
        assert self_score >= float((own * own).sum()) - 1e-9


def test_group_size_one_degenerates_to_dot_ranking(emb):
    df, vals = emb
    ds = ray.data.from_pandas(df)
    got = late_interaction_topk(ds, [3], group_size=1, topk=8)
    v = vals.astype(np.float64)
    dots = v @ v[3]
    order = np.lexsort((np.arange(N), -dots))[:8]
    assert [int(d) for d in got["doc"]] == [int(i) for i in order]
    assert np.allclose(
        got["score"].to_numpy(), dots[order], rtol=0, atol=1e-12
    )


def test_contracts(emb):
    df, _ = emb
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="query_docs"):
        late_interaction_topk(ds, [], group_size=G)
    with pytest.raises(ValueError, match="group_size"):
        late_interaction_topk(ds, [0], group_size=0)
    with pytest.raises(ValueError, match="topk"):
        late_interaction_topk(ds, [0], group_size=G, topk=0)
    with pytest.raises(ValueError, match="no embedding rows"):
        late_interaction_topk(ds, [10_000], group_size=G)
