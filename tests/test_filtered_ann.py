"""Filtered ANN: exactness at any selectivity vs a filtered brute force."""

import numpy as np
import pandas as pd

import ray.data
from mini_ivf_ray.pipelines.similarity import brute_force_ann, filtered_ann


def _embeddings(n=300, d=16, seed=11):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d))
    return (
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [v.tolist() for v in mat]}
        ),
        mat,
    )


def test_filtered_equals_bruteforce_over_subset():
    df, mat = _embeddings()
    allowed = np.arange(0, 300, 3)  # every third vector
    ds = ray.data.from_pandas(df).repartition(5)
    sub = df[df["vec_id"].isin(allowed)].reset_index(drop=True)
    sub_ds = ray.data.from_pandas(sub)
    Q = mat[:4]
    qids = np.arange(4)
    got = filtered_ann(ds, Q, qids, allowed, k=7)
    want = brute_force_ann(sub_ds, Q, qids, k=7)
    assert got.equals(want)
    assert set(got["vec_id"]) <= set(int(a) for a in allowed)


def test_empty_whitelist_is_empty():
    df, mat = _embeddings(n=50)
    ds = ray.data.from_pandas(df)
    res = filtered_ann(ds, mat[:2], np.arange(2), np.array([], dtype=np.int64), k=5)
    assert len(res) == 0


def test_singleton_whitelist():
    df, mat = _embeddings(n=50)
    ds = ray.data.from_pandas(df)
    res = filtered_ann(ds, mat[:3], np.arange(3), np.array([17]), k=5)
    assert len(res) == 3
    assert set(res["vec_id"]) == {17}
    assert (res["rank"] == 0).all()


def test_similarity_threshold_is_suffix_cut(ray_session):
    """ES knn similarity cutoff: filtering a cosine-desc top-k by
    cos >= t removes a pure suffix, so ranks stay dense with no
    renumbering — pinned on the synthetic embeddings."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.similarity import brute_force_ann

    rng = np.random.RandomState(3)
    emb = rng.randn(400, 16).astype(np.float32)
    ds = ray.data.from_items(
        [
            {"vec_id": i, "embedding": emb[i].tolist()}
            for i in range(400)
        ]
    )
    q = emb[:3]
    res = brute_force_ann(ds, q, [0, 1, 2], k=15)
    t = float(np.quantile(res["cosine"], 0.5))
    kept = res[res["cosine"].to_numpy() >= t]
    for qid, g in kept.groupby("query_id"):
        r = g["rank"].to_numpy()
        assert np.array_equal(np.sort(r), np.arange(r.size)), qid
        # every dropped row of this query ranked BELOW every kept row
        dropped = res[(res["query_id"] == qid)
                      & (res["cosine"].to_numpy() < t)]
        if len(dropped):
            assert dropped["rank"].min() > r.max()


def test_boundary_tie_exactness_across_block_layouts(ray_session):
    """Duplicate vectors tie EXACTLY; when the tie straddles the k
    boundary the survivor must be the (cosine desc, vec_id asc)
    member regardless of how Ray blocks the corpus — the flaky
    hybrid_rrf root cause (bare per-block argpartition kept an
    arbitrary tied member depending on the run's block layout)."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.similarity import brute_force_ann

    rng = np.random.RandomState(9)
    base = rng.randn(30, 8)
    # duplicate every vector once: ids 0..29 and 100..129 are exact
    # duplicates (100+i == i), so EVERY rank boundary is a tie
    emb = np.vstack([base, base])
    ids = list(range(30)) + list(range(100, 130))
    rows = [
        {"vec_id": i, "embedding": emb[j].tolist()}
        for j, i in enumerate(ids)
    ]
    q = base[:2]
    # brute truth under the global rule
    qa = q / np.linalg.norm(q, axis=1, keepdims=True)
    ea = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = qa @ ea.T
    want = {}
    for qi in range(2):
        order = sorted(
            range(len(ids)), key=lambda j: (-sims[qi, j], ids[j])
        )[:7]
        want[qi] = [(ids[j], round(float(sims[qi, j]), 6)) for j in order]
    for nparts in (1, 3, 7, 13):
        ds = ray.data.from_items(rows).repartition(nparts)
        res = brute_force_ann(ds, q, [0, 1], k=7)
        for qi in range(2):
            g = res[res["query_id"] == qi].sort_values("rank")
            got = [
                (int(v), float(c))
                for v, c in zip(g["vec_id"], g["cosine"])
            ]
            assert got == want[qi], (nparts, qi)
