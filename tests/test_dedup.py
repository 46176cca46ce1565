"""Dedup operators: exact, MinHash-LSH, SimHash, Jaccard verify,
embedding near-dup."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from mini_ivf_ray.functions.tokenize import tokenize
from mini_ivf_ray.pipelines.dedup import (
    MinHasher,
    embedding_dup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard,
    simhash64,
    simhash_dup_pairs,
    verify_pairs_exact,
)


def _docs_with_dups():
    """30 base docs + near-dups (1-token perturbation) + exact dups."""
    rng = np.random.default_rng(77)
    vocab = [f"t{i}" for i in range(50)]
    texts, rows = [], []
    for i in range(30):
        toks = list(rng.choice(vocab, size=40))
        texts.append(" ".join(toks))
        rows.append({"doc_id": i, "text": texts[i]})
    # near dups of docs 0..4 (ids 100..104): change one token
    for i in range(5):
        toks = texts[i].split()
        toks[5] = "zzz"
        rows.append({"doc_id": 100 + i, "text": " ".join(toks)})
    # exact dups of docs 10, 11 (ids 200, 201)
    rows.append({"doc_id": 200, "text": texts[10]})
    rows.append({"doc_id": 201, "text": texts[11]})
    return pd.DataFrame(rows)


def test_exact_dedup():
    df = _docs_with_dups()
    out = exact_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == len(df) - 2  # two exact dups collapse
    dup = out[out.n_dups > 1]
    assert set(dup.doc_id) == {10, 11}  # min doc_id kept


def test_minhash_estimates_jaccard():
    mh = MinHasher(k=128, w=3)
    a = tokenize(" ".join(f"x{i}" for i in range(100)))
    b = tokenize(" ".join(f"x{i}" for i in range(80)))  # ~80% shingle overlap
    sa, sb = mh.signature(a), mh.signature(b)
    est = float(np.mean(sa == sb))
    exact = ngram_jaccard([" ".join(a)], [" ".join(b)], w=3)[0]
    assert abs(est - exact) < 0.15


def test_lsh_finds_near_dups():
    df = _docs_with_dups()
    pairs = lsh_candidate_pairs(
        ray.data.from_pandas(df), k=64, bands=16, threshold=0.5
    ).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    for i in range(5):
        assert (i, 100 + i) in found  # near-dups surfaced
    assert (10, 200) in found and (11, 201) in found  # exact dups too
    # verify with exact jaccard
    verified = verify_pairs_exact(ray.data.from_pandas(df), pairs, w=3, threshold=0.6)
    vfound = set(map(tuple, verified[["id_a", "id_b"]].to_numpy()))
    assert (10, 200) in vfound
    assert all(j == 1.0 for j in verified[verified.id_a == 10].jaccard)


def test_simhash_near_dup_low_hamming():
    df = _docs_with_dups()
    h0 = simhash64(tokenize(df[df.doc_id == 0].text.iloc[0]))
    h100 = simhash64(tokenize(df[df.doc_id == 100].text.iloc[0]))
    ham = bin(h0 ^ h100).count("1")
    assert ham <= 10  # near dup -> close simhash
    out = simhash_dup_pairs(ray.data.from_pandas(df), max_hamming=3).to_pandas()
    found = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (10, 200) in found and (11, 201) in found  # exact dups: hamming 0


def test_embedding_dup_pairs():
    rng = np.random.default_rng(5)
    base = rng.normal(size=(20, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(20)]
    # vec 100 ~ vec 0 (tiny noise), vec 101 == vec 1
    rows.append({"vec_id": 100, "embedding": (base[0] + rng.normal(scale=1e-3, size=16)).tolist()})
    rows.append({"vec_id": 101, "embedding": base[1].tolist()})
    ds = ray.data.from_items(rows)
    pairs = embedding_dup_pairs(ds, tau=0.99).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 100) in found and (1, 101) in found
    # random gaussian pairs at d=16 essentially never reach 0.99
    assert len(found) == 2


def test_srp_lsh_finds_embedding_dups():
    from mini_ivf_ray.pipelines.dedup import embedding_dup_pairs_lsh

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    rows.append({"vec_id": 100, "embedding": (base[0] + rng.normal(scale=1e-3, size=16)).tolist()})
    rows.append({"vec_id": 101, "embedding": base[1].tolist()})
    ds = ray.data.from_items(rows)
    pairs = embedding_dup_pairs_lsh(ds, tau=0.99).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 100) in found and (1, 101) in found
    # agrees with the exact broadcast baseline
    exact = embedding_dup_pairs(ds, tau=0.99).to_pandas()
    efound = set(map(tuple, exact[["id_a", "id_b"]].to_numpy()))
    assert found == efound


def test_bucket_index_pairs_small_is_full_clique():
    from mini_ivf_ray.pipelines.dedup import _bucket_index_pairs

    ids = np.array([3, 7, 9, 12])
    sigh = np.array([1, 2, 3, 4], dtype=np.uint64)
    ii, jj = _bucket_index_pairs(ids, sigh, cap=2000)
    assert len(ii) == 6  # full clique of 4


def test_bucket_index_pairs_megabucket_collapses():
    """Beyond the cap, identical-fingerprint members collapse: stars
    within huge identical groups, clique across representatives — never
    an O(n^2) loop, never a silent total drop."""
    from mini_ivf_ray.pipelines.dedup import _bucket_index_pairs

    n = 50
    ids = np.arange(n)
    # two identical-sig groups (40 + 8) and two singletons
    sigh = np.concatenate(
        [np.full(40, 11), np.full(8, 22), [33], [44]]
    ).astype(np.uint64)
    ii, jj = _bucket_index_pairs(ids, sigh, cap=10)
    pairs = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    # group of 40 > cap -> star on its min id
    assert (0, 1) in pairs and (0, 39) in pairs and (1, 2) not in pairs
    # group of 8 <= cap -> clique
    assert (40, 41) in pairs and (41, 47) in pairs
    # representatives (0, 40, 48, 49) form a clique
    for a, b in [(0, 40), (0, 48), (40, 49), (48, 49)]:
        assert (a, b) in pairs
    # every duplicate component is connected, size stays O(n)
    assert len(pairs) < n * 3


def test_fetch_by_ids_semi_join():
    from mini_ivf_ray.pipelines.dedup import fetch_by_ids

    df = pd.DataFrame({"doc_id": range(100), "text": [f"t{i}" for i in range(100)]})
    ds = ray.data.from_pandas(df)
    out = fetch_by_ids(ds, "doc_id", {5, 50, 99}, ["doc_id", "text"])
    got = dict(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
    assert got == {5: "t5", 50: "t50", 99: "t99"}


def test_connected_components():
    from mini_ivf_ray.pipelines.dedup import connected_components

    pairs = pd.DataFrame(
        {"id_a": [1, 2, 10, 20, 7], "id_b": [2, 3, 11, 21, 3]}
    )
    # components: {1,2,3,7}, {10,11}, {20,21}
    out = connected_components(pairs).sort_values("doc_id").reset_index(drop=True)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_random_vs_bfs():
    from collections import defaultdict, deque

    from mini_ivf_ray.pipelines.dedup import connected_components

    rng = np.random.default_rng(17)
    a = rng.integers(0, 300, 500)
    b = rng.integers(0, 300, 500)
    m = a != b
    pairs = pd.DataFrame({"id_a": np.minimum(a[m], b[m]), "id_b": np.maximum(a[m], b[m])})
    out = connected_components(pairs)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    # BFS reference
    adj = defaultdict(set)
    for x, y in zip(pairs["id_a"], pairs["id_b"]):
        adj[int(x)].add(int(y)); adj[int(y)].add(int(x))
    seen = {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, q = [], deque([start])
        seen[start] = True
        while q:
            u = q.popleft(); comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen[v] = True; q.append(v)
        lab = min(comp)
        for u in comp:
            assert got[u] == lab


def test_verify_pairs_exact_distributed_matches_driver():
    """The distributed pair-bucket exact-Jaccard verify must emit the
    same pairs and bit-identical float64 jaccard values as the driver
    path (forced with driver_threshold=0)."""
    import pandas as pd

    from mini_ivf_ray.pipelines.dedup import (
        lsh_candidate_pairs,
        verify_pairs_exact,
        verify_pairs_exact_ds,
    )

    df = _docs_with_dups()
    cand = lsh_candidate_pairs(
        ray.data.from_pandas(df), k=64, bands=16, threshold=0.3
    ).to_pandas()
    assert len(cand) > 3
    drv = verify_pairs_exact(
        ray.data.from_pandas(df), cand[["id_a", "id_b"]], w=3, threshold=0.5
    ).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    dist = (
        verify_pairs_exact_ds(
            ray.data.from_pandas(df),
            ray.data.from_pandas(cand[["id_a", "id_b"]]),
            w=3,
            threshold=0.5,
            driver_threshold=0,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        drv.astype({"id_a": "int64", "id_b": "int64"}),
        dist.astype({"id_a": "int64", "id_b": "int64"}),
    )
