"""Link-graph PageRank: fixed-point integer iteration must be
bit-identical to a local replay, invariant to partitioning, and loud
about ids the join padding cannot represent exactly."""

import numpy as np
import pandas as pd
import pytest

import ray.data
from mini_ivf_ray.pipelines.graph import PR_SCALE, pagerank, synth_edges

ITERS = 4


def _nodes(ids):
    return ray.data.from_arrow(
        __import__("pyarrow").table({"doc_id": np.asarray(ids, dtype=np.int64)})
    )


def _local_pagerank(ids, src, dst, iters=ITERS, scale=PR_SCALE):
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    n = ids.size
    ix = {int(v): i for i, v in enumerate(ids)}
    deg = np.zeros(n, dtype=np.int64)
    for s in src:
        deg[ix[int(s)]] += 1
    base = (15 * (scale // n)) // 100
    r = np.full(n, scale // n, dtype=np.int64)
    for _ in range(iters):
        m = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            m[ix[int(d)]] += r[ix[int(s)]] // deg[ix[int(s)]]
        r = base + (85 * m) // 100
    return pd.DataFrame({"doc_id": ids, "rank": r})


def _canon(df):
    df = df.copy()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)[["doc_id", "rank"]]


def test_pagerank_matches_local_integer_replay():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 10_000, size=300)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    e = edges.to_pandas()
    assert len(e) and (e["src"] != e["dst"]).all()
    got = pagerank(edges, nodes, iters=ITERS, driver_threshold=0).to_pandas()
    want = _local_pagerank(ids, e["src"].to_numpy(), e["dst"].to_numpy())
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_pagerank_partitioning_invariant():
    """Bit-identical ranks whatever the block layout — the fixed-point
    formulation has no summation-order dependence."""
    rng = np.random.default_rng(5)
    ids = np.unique(rng.integers(0, 5_000, size=120)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    a = pagerank(edges, nodes, iters=3, driver_threshold=0).to_pandas()
    b = pagerank(
        edges.repartition(7), nodes.repartition(3), iters=3, num_buckets=5,
        driver_threshold=0,
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))


def test_pagerank_base_rank_for_sources_and_mass_bound():
    """A node with no in-links holds exactly the base rank; total mass
    never exceeds the injected total (lost-mass convention)."""
    import pyarrow as pa

    ids = np.arange(6, dtype=np.int64)
    # star: everyone points at 0; nobody points back
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([1, 2, 3, 4, 5], dtype=np.int64),
                "dst": np.zeros(5, dtype=np.int64),
            }
        )
    )
    r = _canon(pagerank(edges, _nodes(ids), iters=ITERS, driver_threshold=0).to_pandas())
    n = ids.size
    base = (15 * (PR_SCALE // n)) // 100
    assert (r.loc[r["doc_id"] != 0, "rank"] == base).all()
    assert r.loc[r["doc_id"] == 0, "rank"].iloc[0] > base
    assert r["rank"].sum() <= PR_SCALE


def test_pagerank_rejects_unrepresentable_ids():
    import pyarrow as pa

    big = np.array([1, 2**53 + 10], dtype=np.int64)
    edges = ray.data.from_arrow(
        pa.table({"src": big[:1], "dst": big[1:]})
    )
    with pytest.raises(ValueError, match="2\\*\\*53"):
        pagerank(edges, _nodes(big), iters=1)


def test_synth_edges_deterministic():
    ids = np.arange(50, dtype=np.int64)
    a = synth_edges(_nodes(ids)).to_pandas().sort_values(["src", "dst"])
    b = synth_edges(_nodes(ids)).to_pandas().sort_values(["src", "dst"])
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    # out-degree 1..3 before self-loop removal => 0..3 after
    assert a.groupby("src").size().max() <= 3


def test_personalized_pagerank_matches_local_replay():
    """Seed-restricted teleport (topic-sensitive PR): base mass lands
    only on seeds; bit-identical to the local integer replay."""
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 4_000, size=150)).astype(np.int64)
    seeds = ids[::10]
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    e = edges.to_pandas()
    got = pagerank(
        edges, nodes, iters=3, seeds=seeds, driver_threshold=0
    ).to_pandas()

    # local replay
    sids = np.sort(ids)
    n = sids.size
    ix = {int(v): i for i, v in enumerate(sids)}
    src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
    deg = np.zeros(n, dtype=np.int64)
    for s in src:
        deg[ix[int(s)]] += 1
    in_seed = np.isin(sids, seeds)
    base = (15 * (PR_SCALE // int(seeds.size))) // 100
    r = np.where(in_seed, PR_SCALE // int(seeds.size), 0).astype(np.int64)
    for _ in range(3):
        m = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            m[ix[int(d)]] += r[ix[int(s)]] // deg[ix[int(s)]]
        r = np.where(in_seed, base, 0) + (85 * m) // 100
    want = pd.DataFrame({"doc_id": sids, "rank": r})
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
    # non-seed nodes with no in-links hold exactly zero
    no_in = ~np.isin(sids, np.unique(dst)) & ~in_seed
    got_c = _canon(got)
    assert (got_c.loc[no_in, "rank"] == 0).all()


def test_personalized_empty_seeds_rejected():
    ids = np.arange(5, dtype=np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes).materialize()
    with pytest.raises(ValueError, match="non-empty"):
        pagerank(edges, nodes, iters=1, seeds=[])


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------


def _local_bfs(src, dst, seeds, max_hops):
    """Plain queue BFS over the directed edge list."""
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    dist = {int(s): 0 for s in seeds}
    frontier = sorted(dist)
    for t in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = t
        frontier = sorted(nxt)
        if not frontier:
            break
    return dist


def _bfs_canon(df):
    df = df.copy()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["dist"] = df["dist"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)[["doc_id", "dist"]]


def test_bfs_matches_local_replay():
    from mini_ivf_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(17)
    ids = np.unique(rng.integers(0, 10_000, size=250)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    e = edges.to_pandas()
    seeds = ids[ids % 10 == 3]
    assert seeds.size
    got = bfs_hops(edges, seeds, max_hops=3, driver_threshold=0).to_pandas()
    want = _local_bfs(e["src"], e["dst"], seeds, 3)
    want_df = pd.DataFrame(
        {"doc_id": sorted(want), "dist": [want[k] for k in sorted(want)]}
    )
    pd.testing.assert_frame_equal(_bfs_canon(got), _bfs_canon(want_df))
    # min-dist property: some node must be reached at dist >= 2 or the
    # fixture is vacuous
    assert (want_df["dist"] >= 2).any()


def test_bfs_partitioning_invariant():
    from mini_ivf_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(23)
    ids = np.unique(rng.integers(0, 5_000, size=120)).astype(np.int64)
    edges = synth_edges(_nodes(ids), max_deg=3).materialize()
    seeds = ids[:5]
    a = _bfs_canon(
        bfs_hops(edges, seeds, max_hops=3, driver_threshold=0).to_pandas()
    )
    b = _bfs_canon(
        bfs_hops(
            edges.repartition(13), seeds, max_hops=3, driver_threshold=0
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_bfs_zero_hops_and_empty_seeds():
    from mini_ivf_ray.pipelines.graph import bfs_hops

    ids = np.arange(10, dtype=np.int64)
    edges = synth_edges(_nodes(ids), max_deg=2).materialize()
    out = _bfs_canon(bfs_hops(edges, [3, 7], max_hops=0).to_pandas())
    assert list(out["doc_id"]) == [3, 7] and list(out["dist"]) == [0, 0]
    with pytest.raises(ValueError, match="non-empty"):
        bfs_hops(edges, [], max_hops=2)


def test_bfs_unreachable_absent():
    """A node with no in-path from the seeds never appears."""
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import bfs_hops

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2], type=pa.int64()),
                "dst": pa.array([2, 3], type=pa.int64()),
            }
        )
    )
    out = _bfs_canon(bfs_hops(edges, [1], max_hops=5).to_pandas())
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["dist"]) == [0, 1, 2]


def test_pagerank_driver_shortcut_matches_distributed():
    """The adaptive driver replay (small graphs) is bit-identical to
    the forced distributed path — uniform AND personalized."""
    rng = np.random.default_rng(29)
    ids = np.unique(rng.integers(0, 6_000, size=180)).astype(np.int64)
    nodes = _nodes(ids)
    edges = synth_edges(nodes, max_deg=3).materialize()
    auto = pagerank(edges, nodes, iters=3).to_pandas()
    forced = pagerank(edges, nodes, iters=3, driver_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(_canon(auto), _canon(forced))
    seeds = ids[::7]
    auto_s = pagerank(edges, nodes, iters=2, seeds=seeds).to_pandas()
    forced_s = pagerank(
        edges, nodes, iters=2, seeds=seeds, driver_threshold=0
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(auto_s), _canon(forced_s))


def test_bfs_driver_shortcut_matches_distributed():
    from mini_ivf_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(41)
    ids = np.unique(rng.integers(0, 6_000, size=160)).astype(np.int64)
    edges = synth_edges(_nodes(ids), max_deg=3).materialize()
    seeds = ids[ids % 9 == 1]
    auto = _bfs_canon(bfs_hops(edges, seeds, max_hops=3).to_pandas())
    forced = _bfs_canon(
        bfs_hops(edges, seeds, max_hops=3, driver_threshold=0).to_pandas()
    )
    pd.testing.assert_frame_equal(auto, forced)


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def _tri_brute(src, dst):
    """Exhaustive reference: unique undirected pairs, count triangles
    per node by checking all (a, b, c) combinations over the adjacency."""
    import itertools

    adj = {}
    pairs = set()
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s == d:
            continue
        pairs.add((min(s, d), max(s, d)))
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    nodes = sorted(adj)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


def _tri_canon(df):
    df = df.copy()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["triangles"] = df["triangles"].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "triangles"]
    ]


def test_triangles_match_bruteforce_and_modes_agree():
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import triangle_counts

    rng = np.random.default_rng(53)
    n = 60
    # dense-ish random graph so triangles are plentiful
    src = rng.integers(0, n, size=400).astype(np.int64)
    dst = rng.integers(0, n, size=400).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    want = _tri_brute(src, dst)
    want_df = pd.DataFrame(
        {"doc_id": sorted(want), "triangles": [want[k] for k in sorted(want)]}
    )
    auto = _tri_canon(triangle_counts(edges).to_pandas())
    forced = _tri_canon(
        triangle_counts(edges, driver_threshold=0).to_pandas()
    )
    pd.testing.assert_frame_equal(auto, _tri_canon(want_df))
    pd.testing.assert_frame_equal(forced, _tri_canon(want_df))
    assert want_df["triangles"].sum() % 3 == 0
    assert len(want_df)  # non-vacuous


def test_triangles_k4_and_multigraph_invariance():
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import triangle_counts

    # K4 (+ parallel duplicates and self-loops that must not count)
    base = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    src = [a for a, _ in base] + [1, 2, 0] + [3]
    dst = [b for _, b in base] + [0, 1, 0] + [3]  # dups reversed + loops
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array(src, dtype=np.int64),
                "dst": np.array(dst, dtype=np.int64),
            }
        )
    )
    for thr in (0, 10**6):
        out = _tri_canon(
            triangle_counts(edges, driver_threshold=thr).to_pandas()
        )
        assert list(out["doc_id"]) == [0, 1, 2, 3]
        assert list(out["triangles"]) == [3, 3, 3, 3]


def test_triangles_partitioning_invariant_distributed():
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import triangle_counts

    rng = np.random.default_rng(59)
    n = 80
    src = rng.integers(0, n, size=300).astype(np.int64)
    dst = rng.integers(0, n, size=300).astype(np.int64)
    t = pa.table({"src": src, "dst": dst})
    a = _tri_canon(
        triangle_counts(
            ray.data.from_arrow(t), driver_threshold=0
        ).to_pandas()
    )
    b = _tri_canon(
        triangle_counts(
            ray.data.from_arrow(t).repartition(11),
            driver_threshold=0,
            num_buckets=5,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_clustering_coefficient_modes_and_pins():
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import clustering_coefficient

    rng = np.random.default_rng(71)
    n = 50
    src = rng.integers(0, n, size=300).astype(np.int64)
    dst = rng.integers(0, n, size=300).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))

    def canon(df):
        df = df.copy()
        for c in ("doc_id", "deg", "triangles"):
            df[c] = df[c].astype("int64")
        return df.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "deg", "triangles", "cc"]
        ]

    auto = canon(clustering_coefficient(edges).to_pandas())
    forced = canon(
        clustering_coefficient(edges, driver_threshold=0).to_pandas()
    )
    pd.testing.assert_frame_equal(auto, forced)
    # brute-force reference from the triangle brute + adjacency degrees
    tri = _tri_brute(src, dst)
    adj = {}
    for s, d in zip(src, dst):
        if s != d:
            adj.setdefault(int(s), set()).add(int(d))
            adj.setdefault(int(d), set()).add(int(s))
    for _, row in auto.iterrows():
        v = int(row["doc_id"])
        assert row["deg"] == len(adj[v])
        assert row["triangles"] == tri.get(v, 0)
        want_cc = 2.0 * tri.get(v, 0) / (len(adj[v]) * (len(adj[v]) - 1))
        assert row["cc"] == want_cc, v
    # every deg>=2 node present, deg<2 absent
    want_nodes = sorted(v for v in adj if len(adj[v]) >= 2)
    assert list(auto["doc_id"]) == want_nodes
    assert (auto["cc"] > 0).any()

    # K4: cc exactly 1.0 everywhere
    k4 = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([0, 0, 0, 1, 1, 2], dtype=np.int64),
                "dst": np.array([1, 2, 3, 2, 3, 3], dtype=np.int64),
            }
        )
    )
    for thr in (0, 10**6):
        out = canon(
            clustering_coefficient(k4, driver_threshold=thr).to_pandas()
        )
        assert list(out["cc"]) == [1.0, 1.0, 1.0, 1.0]


def _kcore_brute(src, dst, k):
    """Sequential peeling reference: repeatedly remove ONE node with
    degree < k (different removal order from the engine's parallel
    peel — the k-core is unique, so results must still agree)."""
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
                break
    return {v: len(ns) for v, ns in adj.items() if ns}


def test_kcore_modes_match_bruteforce():
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import kcore

    rng = np.random.default_rng(37)
    n = 60
    src = rng.integers(0, n, size=260).astype(np.int64)
    dst = rng.integers(0, n, size=260).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))

    def canon(df):
        df = df.copy()
        for c in ("doc_id", "deg"):
            df[c] = df[c].astype("int64")
        return df.sort_values("doc_id").reset_index(drop=True)

    for k in (2, 4, 6):
        want = _kcore_brute(src, dst, k)
        auto = canon(kcore(edges, k).to_pandas())
        forced = canon(kcore(edges, k, driver_threshold=0).to_pandas())
        pd.testing.assert_frame_equal(auto, forced)
        assert dict(zip(auto["doc_id"], auto["deg"])) == want, k
        assert (auto["deg"] >= k).all()
    # a k larger than any degree: empty core, both modes
    for thr in (0, 10**6):
        assert kcore(edges, 1000, driver_threshold=thr).count() == 0


def test_kcore_multiround_peel_pin():
    """K4 with a 3-node tail hanging off node 0: the k=2 peel needs 3
    rounds (6 -> 5 -> 4) and must leave exactly the K4, each deg 3;
    parallel edges and self-loops must not change anything."""
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import kcore

    src = np.array([0, 0, 0, 1, 1, 2, 0, 4, 5, 0, 3, 6], dtype=np.int64)
    dst = np.array([1, 2, 3, 2, 3, 3, 4, 5, 6, 1, 3, 6], dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    for thr in (0, 10**6):
        out = (
            kcore(edges, 2, driver_threshold=thr)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert list(out["doc_id"].astype("int64")) == [0, 1, 2, 3]
        assert list(out["deg"].astype("int64")) == [3, 3, 3, 3]
    # max_rounds guard: the same peel cannot finish in 1 round
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, 2, driver_threshold=0, max_rounds=1)


def test_kcore_partitioning_invariance():
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import kcore

    rng = np.random.default_rng(11)
    n = 40
    src = rng.integers(0, n, size=150).astype(np.int64)
    dst = rng.integers(0, n, size=150).astype(np.int64)
    tbl = pa.table({"src": src, "dst": dst})

    def canon(ds):
        df = ds.to_pandas()
        for c in ("doc_id", "deg"):
            df[c] = df[c].astype("int64")
        return df.sort_values("doc_id").reset_index(drop=True)

    a = canon(
        kcore(
            ray.data.from_arrow(tbl).repartition(1),
            3,
            num_buckets=4,
            driver_threshold=0,
        )
    )
    b = canon(
        kcore(
            ray.data.from_arrow(tbl).repartition(7),
            3,
            num_buckets=13,
            driver_threshold=0,
        )
    )
    pd.testing.assert_frame_equal(a, b)


def _ktruss_brute(src, dst, k):
    """Set-based reference peel."""
    pairs = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(src, dst)
        if a != b
    }
    while True:
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in pairs}
        bad = {e for e, s in sup.items() if s < k - 2}
        if not bad:
            return {e: sup[e] for e in pairs}
        pairs -= bad


def test_ktruss_modes_match_bruteforce():
    import pyarrow as pa
    import pytest

    from mini_ivf_ray.pipelines.graph import ktruss

    rng = np.random.default_rng(41)
    n = 50
    src = rng.integers(0, n, size=300).astype(np.int64)
    dst = rng.integers(0, n, size=300).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))

    def canon(df):
        df = df.copy()
        for c in ("id_a", "id_b", "support"):
            df[c] = df[c].astype("int64")
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    for k in (3, 4):
        want = _ktruss_brute(src, dst, k)
        auto = canon(ktruss(edges, k).to_pandas())
        if k == 3:
            # forced-distributed once (every peel round spawns the full
            # oriented-wedge join cascade — k=3 keeps the round count
            # and wall time bounded); small num_buckets for test speed
            forced = canon(
                ktruss(
                    edges, k, num_buckets=8, driver_threshold=0
                ).to_pandas()
            )
            assert auto.equals(forced)  # adaptive == forced bit-identical
        got = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(auto["id_a"], auto["id_b"], auto["support"])
        }
        assert got == want, k
        # truss property: every surviving edge closes >= k-2 in-truss
        # triangles, and the 3-truss is non-empty on this graph
        assert all(s >= k - 2 for s in got.values())
    assert len(_ktruss_brute(src, dst, 3)) > 0
    with pytest.raises(ValueError, match="k must be >= 3"):
        ktruss(edges, 2)


def test_ktruss_planted_clique_peels_the_tail():
    """A 5-clique with pendant tail edges: the 4-truss is EXACTLY the
    clique (support 3 on every edge) and the peel provably removes
    edges (the tails die, and so do triangle-free chords)."""
    import pyarrow as pa

    from mini_ivf_ray.pipelines.graph import ktruss

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tails = [(0, 10), (10, 11), (1, 12), (12, 13), (2, 14)]
    src = np.array([a for a, _ in clique + tails], dtype=np.int64)
    dst = np.array([b for _, b in clique + tails], dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = ktruss(edges, 4, num_buckets=8, driver_threshold=0).to_pandas()
    assert len(got) == len(clique)
    assert set(zip(map(int, got["id_a"]), map(int, got["id_b"]))) == set(
        clique
    )
    assert (got["support"].astype(int) == 3).all()
    # k-truss lives inside the (k-1)-core (Cohen 2008)
    from mini_ivf_ray.pipelines.graph import kcore

    core = kcore(edges, 3, driver_threshold=0).to_pandas()
    core_nodes = set(map(int, core["doc_id"]))
    assert {int(x) for x in got["id_a"]} | {
        int(x) for x in got["id_b"]
    } <= core_nodes


def test_lpa_clique_converges_and_tie_rule(ray_session):
    """Two 4-cliques joined by one bridge edge: 3 sync rounds send
    every clique member to its clique's min id; the deterministic
    (count desc, label asc) tie rule is pinned on a 2-node path."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.graph import lpa_communities

    def _edges(pairs):
        return ray.data.from_items(
            [{"src": a, "dst": b} for a, b in pairs]
        )

    c1 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    c2 = [(20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23)]
    bridge = [(13, 20)]
    nodes = ray.data.from_items(
        [{"doc_id": i} for i in [10, 11, 12, 13, 20, 21, 22, 23]]
    )
    out = (
        lpa_communities(_edges(c1 + c2 + bridge), nodes, iters=3)
        .to_pandas()
        .sort_values("doc_id")
    )
    lab = dict(zip(out["doc_id"].astype(int), out["label"].astype(int)))
    assert all(lab[i] == 10 for i in (10, 11, 12, 13))
    assert all(lab[i] in (10, 20) for i in (20, 21, 22, 23))
    # pair graph: after 1 round each adopts the other's label; the
    # mode over a single neighbor is that neighbor (tie rule trivial)
    p = (
        lpa_communities(
            _edges([(1, 2)]),
            ray.data.from_items([{"doc_id": 1}, {"doc_id": 2},
                                 {"doc_id": 9}]),
            iters=1,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    got = dict(zip(p["doc_id"].astype(int), p["label"].astype(int)))
    assert got == {1: 2, 2: 1, 9: 9}  # isolated node 9 keeps its label


def test_lpa_distributed_equals_local(ray_session):
    """Forced-distributed LPA == the vectorized driver replay
    bit-identically on a random multigraph."""
    import numpy as np
    import ray.data

    from mini_ivf_ray.pipelines.graph import lpa_communities

    rng = np.random.RandomState(5)
    n = 16
    src = rng.randint(0, n, size=40)
    dst = rng.randint(0, n, size=40)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = ray.data.from_items(
        [{"src": int(a), "dst": int(b)} for a, b in zip(src, dst)]
    )
    nodes = ray.data.from_items([{"doc_id": i} for i in range(n)])
    a = (
        lpa_communities(edges, nodes, iters=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        lpa_communities(edges, nodes, iters=2, driver_threshold=0,
                        num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(
        a["doc_id"].to_numpy().astype(np.int64),
        b["doc_id"].to_numpy().astype(np.int64),
    )
    assert np.array_equal(
        a["label"].to_numpy().astype(np.int64),
        b["label"].to_numpy().astype(np.int64),
    )
