"""QueryObs analog (r3 VERDICT #6; reference index_ivfpq.cpp:412-470):
per-partition (probes, postings, hits@k) histogram for a workload."""

import numpy as np

from mini_ivf_ray.pipelines.obs import query_observations

QUERIES = [(0, "the data web"), (1, "w00042 w00100"), (2, "zz missing"), (3, "")]


def test_query_observations_invariants(tiny_index):
    idx, cfg, docs = tiny_index
    obs = query_observations(idx, QUERIES, cfg)
    assert list(obs.columns) == ["partition", "probes", "postings", "hits"]
    assert (obs["partition"].to_numpy() < cfg.num_partitions).all()
    assert (obs["probes"] > 0).all()  # only touched partitions reported
    assert (obs["hits"] >= 0).all() and (obs["postings"] >= 0).all()
    # the workload has resolvable terms -> something was probed and hit
    assert obs["probes"].sum() > 0
    assert obs["hits"].sum() > 0
    # postings dominate hits (a hit is a posting of a top-k doc)
    assert int(obs["hits"].sum()) <= int(obs["postings"].sum())


def test_query_observations_empty_workload(tiny_index):
    idx, cfg, docs = tiny_index
    obs = query_observations(idx, [(0, "zz qq absenttoken")], cfg)
    assert len(obs) == 0


def test_query_observations_hits_localise_results(tiny_index):
    """Each top-k result doc's matching postings are attributed to the
    partition the salt plan routed them to — summed hits must cover
    every (result, matching-term) pair exactly once."""
    from mini_ivf_ray.functions.tokenize import tokenize
    from mini_ivf_ray.pipelines.query import BM25Searcher

    idx, cfg, docs = tiny_index
    s = BM25Searcher(idx, cfg)
    expected = 0
    for qid, qtext in QUERIES:
        res = s.topk_for_text(qtext)
        terms = sorted(
            t for t in set(tokenize(qtext)) if s.stats.df.get(t, 0) > 0
        )
        docs_set = {d for d, _ in res}
        for t in terms:
            blocks = s.reader.term_blocks(t, s.stats.term_locations(t, cfg))
            if blocks is None:
                continue
            d, _ = blocks.all_postings()
            expected += int(
                np.isin(np.fromiter(docs_set, dtype=np.uint64), d).sum()
            ) if docs_set else 0
    obs = query_observations(idx, QUERIES, cfg)
    assert int(obs["hits"].sum()) == expected


def test_ivf_observations_invariants(tmp_path):
    """QueryObs over an IVF index: ground-truth hits per partition sum
    to queries x k; probed hits never exceed them; full-probe recall is
    exactly 1."""
    import pandas as pd
    import ray.data

    from mini_ivf_ray.pipelines.obs import ivf_observations
    from mini_ivf_ray.pipelines.similarity import build_ivf_index

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 16)) * 3
    labels = rng.integers(0, 8, 300)
    mat = centers[labels] + rng.normal(size=(300, 16))
    df = pd.DataFrame(
        {"vec_id": np.arange(300), "embedding": [v.tolist() for v in mat]}
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(ray.data.from_pandas(df), idx, n_centroids=8, seed=7)

    Q = mat[:6]
    k = 5
    obs = ivf_observations(idx, Q, k=k, nprobe=2)
    assert list(obs.columns) == [
        "partition", "probes", "scored", "gt_hits", "gt_hits_probed",
    ]
    assert int(obs["gt_hits"].sum()) == len(Q) * k
    assert (obs["gt_hits_probed"] <= obs["gt_hits"]).all()
    assert int(obs["probes"].sum()) == len(Q) * 2  # nprobe per query
    # clustered queries: probing their own cluster finds most gt
    recall = obs["gt_hits_probed"].sum() / obs["gt_hits"].sum()
    assert recall > 0.5

    full = ivf_observations(idx, Q, k=k, nprobe=8)
    assert int(full["gt_hits_probed"].sum()) == int(full["gt_hits"].sum())
